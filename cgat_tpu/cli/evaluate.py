"""``cgat-test``: checkpoint evaluation CLI (reference: test.py:21-38).

Loads a checkpoint and reports loss/MAE/RMSE on the test split of its
dataset (or an explicit dataset path).
"""
from __future__ import annotations

import argparse
import json


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("ckpt", help="checkpoint run directory")
    p.add_argument("--data-path", default=None,
                   help="override dataset (default: checkpoint's data_path, "
                        "evaluated on its test split)")
    args = p.parse_args(argv)

    from ..data.dataset import load_dataset_dir
    from ..training.trainer import load_trainer
    if args.data_path:
        trainer, params, _ = load_trainer(args.ckpt, train=False)
        graphs = load_dataset_dir(args.data_path,
                                  fea_path=trainer.cfg.fea_path,
                                  max_neighbor_number=trainer.cfg.max_nbr,
                                  target=trainer.cfg.target)
    else:
        trainer, params, _ = load_trainer(args.ckpt, train=True)
        graphs = trainer.test_graphs
    metrics = trainer.evaluate_split(params, graphs)
    print(json.dumps({f"test_{k}": v for k, v in metrics.items()}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
