"""``cgat-train-gp`` / ``train-GP``: GP uncertainty head on frozen CGAT
embeddings (reference: CGAT/gaussian_process.py:568-673).

Trains a sparse variational GP (JAX re-implementation of the reference's
gpytorch ApproximateGP) on graph embeddings from a trained CGAT checkpoint.
"""
from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cgat-model", required=True,
                   help="trained CGAT checkpoint run directory")
    p.add_argument("--data-path", default=None,
                   help="prepared dataset (default: checkpoint's data_path)")
    p.add_argument("--embedding-path", default=None,
                   help="precomputed embedding pickle (EmbeddingData path, "
                        "gaussian_process.py:95-138)")
    p.add_argument("--inducing-points", type=int, default=500)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--learning-rate", type=float, default=1e-2)
    p.add_argument("--zero-mean", action="store_true",
                   help="ZeroMean instead of ConstantMean")
    p.add_argument("--on-the-fly", action="store_true", dest="on_the_fly",
                   help="embed each batch through the frozen CGAT inside "
                        "the GP step instead of precomputing all embeddings "
                        "(reference on-the-fly mode, "
                        "gaussian_process.py:241-296; use for huge pools)")
    p.add_argument("--devices", type=int, default=1,
                   help="shard the frozen-backbone embedding pass over this "
                        "many dp replicas (mesh equivalent of the "
                        "reference's DDP GP, gaussian_process.py:644-672)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="gp_model.pickle.gz")
    args = p.parse_args(argv)

    from ..uncertainty.gp import train_gp_from_checkpoint
    train_gp_from_checkpoint(args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
