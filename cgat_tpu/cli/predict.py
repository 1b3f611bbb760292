"""``cgat-predict``: batch inference CLI (reference: CGAT/predict.py:10-40).

Loads a checkpoint, runs denormalised predictions over a prepared dataset and
dumps them to a pickle.
"""
from __future__ import annotations

import argparse
import gzip
import pickle


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("ckpt", help="checkpoint run directory")
    p.add_argument("data", help="prepared .pickle.gz dataset (file or dir)")
    p.add_argument("--out", default="predictions.pickle.gz")
    p.add_argument("--target", default=None,
                   help="override target key (default: from checkpoint)")
    p.add_argument("--embeddings", action="store_true",
                   help="export graph embeddings instead of predictions "
                        "(Utilities/calculate_embeddings.py flow)")
    args = p.parse_args(argv)

    from ..data.dataset import load_dataset_dir
    from ..training.trainer import load_trainer
    trainer, params, meta = load_trainer(args.ckpt, train=False)
    target = args.target or trainer.cfg.target
    graphs = load_dataset_dir(args.data, fea_path=trainer.cfg.fea_path,
                              max_neighbor_number=trainer.cfg.max_nbr,
                              target=target)
    if args.embeddings:
        out = {"embeddings": trainer.embeddings(params, graphs),
               "ids": [g.cry_id for g in graphs]}
    else:
        out = {"pred": trainer.predict(params, graphs),
               "ids": [g.cry_id for g in graphs],
               "target": [g.target for g in graphs]}
    with gzip.open(args.out, "wb") as f:
        pickle.dump(out, f)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
