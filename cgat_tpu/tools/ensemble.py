"""Seed-ensemble orchestration: train K members, predict, aggregate.

The reference runs seed ensembles by hand — shell loops over ``train-CGAT
--seed s`` (training_scripts/train.sh) and per-seed prediction export
(Utilities/prediction.py:30-68, errors_of_additional_data.py) — with no
single entry point. ``cgat-ensemble`` makes the sweep first-class:

* ``train``: train the same configuration under K seeds (sequentially, one
  process — checkpoints land under ``<ckpt-dir>/runs/<prefix>f-<seed>``).
* ``predict``: run every member over prepared datasets, exporting per-seed
  prediction columns exactly like Utilities/prediction.py.
* ``summarize``: aggregate the member columns into ``ensemble.csv`` with
  the ensemble mean, the member spread (std — the ensemble uncertainty the
  reference's AL workflow ranks by), and |error| vs the stored target.
"""
from __future__ import annotations

import argparse
import csv
import glob
import os

import numpy as np


def member_run_name(prefix: str, seed: int) -> str:
    """Mirrors the reference's run naming (train.py:38: f-{seed}_t-{date})
    minus the timestamp so orchestrated runs are discoverable."""
    return f"{prefix}f-{seed}"


def train_ensemble(seeds, train_argv, *, ckpt_dir: str = "tb_logs",
                   run_prefix: str = "ens_") -> list[str]:
    """Train one member per seed; returns the member run directories."""
    from ..cli.train import main as train_main

    run_dirs = []
    for seed in seeds:
        name = member_run_name(run_prefix, seed)
        argv = list(train_argv) + ["--seed", str(seed), "--run-name", name,
                                   "--ckpt-dir", ckpt_dir]
        rc = train_main(argv)
        if rc not in (0, None):
            raise RuntimeError(f"member seed={seed} failed with rc={rc}")
        run_dirs.append(os.path.join(ckpt_dir, "runs", name))
    return run_dirs


def find_members(ckpt_dir: str, run_prefix: str = "ens_") -> list[str]:
    """Member run dirs under ``<ckpt_dir>/runs`` matching the prefix."""
    pat = os.path.join(ckpt_dir, "runs", f"{run_prefix}f-*")
    return sorted(d for d in glob.glob(pat) if os.path.isdir(d))


def summarize(out_dir: str) -> dict:
    """Aggregate per-seed prediction columns written by ``ensemble_predict``
    (``<out_dir>/<dataset>/<seed>.txt`` + ``target.txt``) into
    ``ensemble.csv`` per dataset; returns {dataset: mae_of_ensemble_mean}."""
    results = {}
    for d in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(d):
            continue
        member_files = sorted(
            f for f in glob.glob(os.path.join(d, "*.txt"))
            if os.path.basename(f) != "target.txt")
        if not member_files:
            continue
        preds = np.stack([np.loadtxt(f).reshape(-1) for f in member_files])
        mean = preds.mean(axis=0)
        spread = preds.std(axis=0, ddof=1) if len(member_files) > 1 \
            else np.zeros_like(mean)
        tfile = os.path.join(d, "target.txt")
        target = (np.loadtxt(tfile).reshape(-1) if os.path.exists(tfile)
                  else np.full_like(mean, np.nan))
        err = np.abs(mean - target)
        with open(os.path.join(d, "ensemble.csv"), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["prediction", "uncertainty", "absolute error"])
            for p, u, e in zip(mean, spread, err):
                w.writerow([float(p), float(u), float(e)])
        results[os.path.basename(d)] = float(np.nanmean(err))
    return results


def main(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="cmd", required=True)

    pt = sub.add_parser("train", help="train K seeds of one configuration")
    pt.add_argument("--seeds", type=int, nargs="+", default=None,
                    help="explicit member seeds")
    pt.add_argument("--n-members", type=int, default=5,
                    help="members 0..N-1 when --seeds not given")
    pt.add_argument("--run-prefix", type=str, default="ens_")
    pt.add_argument("--ckpt-dir", type=str, default="tb_logs")
    pt.add_argument("train_args", nargs=argparse.REMAINDER,
                    help="flags forwarded to train-CGAT (put -- first)")

    pp = sub.add_parser("predict",
                        help="member predictions over prepared datasets")
    pp.add_argument("--ckpt-dir", type=str, default="tb_logs")
    pp.add_argument("--run-prefix", type=str, default="ens_")
    pp.add_argument("--out-dir", type=str, required=True)
    pp.add_argument("--data", type=str, nargs="+", required=True,
                    help="prepared .pickle.gz files")
    pp.add_argument("--summarize", action="store_true",
                    help="also write ensemble.csv aggregates")

    ps = sub.add_parser("summarize",
                        help="aggregate member columns into ensemble.csv")
    ps.add_argument("--out-dir", type=str, required=True)

    args = p.parse_args(argv)
    if args.cmd == "train":
        seeds = args.seeds if args.seeds is not None \
            else list(range(args.n_members))
        extra = [a for a in args.train_args if a != "--"]
        dirs = train_ensemble(seeds, extra, ckpt_dir=args.ckpt_dir,
                              run_prefix=args.run_prefix)
        print("\n".join(dirs))
    elif args.cmd == "predict":
        from .analysis import ensemble_predict
        members = find_members(args.ckpt_dir, args.run_prefix)
        if not members:
            raise SystemExit(f"no member runs under {args.ckpt_dir}/runs "
                             f"with prefix {args.run_prefix!r}")
        ensemble_predict(members, args.data, args.out_dir)
        if args.summarize:
            print(summarize(args.out_dir))
    else:
        print(summarize(args.out_dir))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
