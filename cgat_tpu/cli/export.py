"""``cgat-export``: freeze a trained run into a serving artifact.

Beyond the reference (its inference is an in-process loop over a live
model, CGAT/predict.py:10-40): the artifact holds pre-lowered StableHLO
prediction functions (``jax.export``) for a family of batch shapes plus
flat parameter arrays, so a serving process predicts without re-tracing
model code. See cgat_tpu/serving/artifact.py.
"""
from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("run_dir", help="training run directory (with checkpoints/)")
    p.add_argument("out_dir", help="artifact output directory")
    p.add_argument("--tag", default="best", choices=("best", "last"))
    p.add_argument("--batch-size", type=int, default=None,
                   help="graphs per serving batch (default: trainer's)")
    p.add_argument("--node-buckets", type=int, nargs="+", default=None,
                   help="node-slot signatures to pre-lower "
                        "(default: 1x/2x/4x the trainer's node bucket)")
    p.add_argument("--platforms", nargs="+", default=["tpu", "cpu"],
                   help="target platforms to lower for")
    args = p.parse_args(argv)

    from ..serving import export_artifact
    manifest = export_artifact(args.run_dir, args.out_dir, tag=args.tag,
                               batch_size=args.batch_size,
                               node_buckets=args.node_buckets,
                               platforms=args.platforms)
    sigs = ", ".join(s["key"] for s in manifest["signatures"])
    print(f"wrote {args.out_dir} ({sigs}; platforms "
          f"{','.join(manifest['platforms'])})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
