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


def soup(ckpt_dir: str, out_run: str, *, run_prefix: str = "ens_",
         tag: str = "best") -> str:
    """Uniform model soup: average the members' parameters into ONE model
    (Wortsman et al. 2022, "Model soups") so serving costs 1x instead of Kx.

    Members must share a model configuration; their normalisation mean/std
    are averaged (they differ only via seed-dependent splits). Returns the
    new run dir, loadable by cgat-test / cgat-predict / transfer."""
    import dataclasses
    import json

    import jax

    from ..training.trainer import CheckpointManager

    members = find_members(ckpt_dir, run_prefix)
    if len(members) < 2:
        raise ValueError(f"need >=2 members under {ckpt_dir}/runs "
                         f"with prefix {run_prefix!r}, found {len(members)}")
    trees, metas = [], []
    for m in members:
        params, meta = CheckpointManager.load(m, tag=tag)
        trees.append(params)
        metas.append(meta)
    mc0 = metas[0]["model_config"]
    for meta in metas[1:]:
        if meta["model_config"] != mc0:
            raise ValueError("members have different model configs; "
                             "cannot average parameters")
    n = float(len(trees))
    avg = jax.tree.map(lambda *xs: sum(np.asarray(x, np.float64)
                                       for x in xs) / n, *trees)
    avg = jax.tree.map(lambda x: np.asarray(x, np.float32), avg)

    import orbax.checkpoint as ocp
    d = os.path.abspath(os.path.join(out_run, "checkpoints"))
    os.makedirs(d, exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.join(d, "best"),
                   {"params": avg, "step": np.int32(0), "opt_state": {}},
                   force=True)
    meta = {
        "epoch": 0, "val_mae": float("nan"), "best_val": float("inf"),
        "plateau": None,
        "mean": float(np.mean([m["mean"] for m in metas])),
        "std": float(np.mean([m["std"] for m in metas])),
        "trainer_config": metas[0]["trainer_config"],
        "model_config": mc0,
        "soup_members": [os.path.basename(m) for m in members],
    }
    with open(os.path.join(d, "best.json"), "w") as f:
        json.dump(meta, f, indent=2, default=str)
    return out_run


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

    po = sub.add_parser("soup", help="average members into one model "
                                     "(uniform model soup)")
    po.add_argument("--ckpt-dir", type=str, default="tb_logs")
    po.add_argument("--run-prefix", type=str, default="ens_")
    po.add_argument("--out-run", type=str, required=True,
                    help="run dir to create for the averaged model")

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
    elif args.cmd == "soup":
        out = soup(args.ckpt_dir, args.out_run, run_prefix=args.run_prefix)
        print(out)
    else:
        print(summarize(args.out_dir))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
