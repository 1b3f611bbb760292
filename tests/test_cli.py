"""End-to-end CLI flow: prepare -> train (smoke) -> evaluate -> predict."""
import gzip
import json
import os
import pickle

import numpy as np
import pytest

from cgat_tpu.cli import evaluate as cli_eval
from cgat_tpu.cli import predict as cli_predict
from cgat_tpu.cli import prepare as cli_prepare
from cgat_tpu.cli import train as cli_train


def make_structures(n=40, seed=0):
    rng = np.random.default_rng(seed)
    species_pool = ["Na", "Cl", "K", "O"]
    entries = []
    for i in range(n):
        na = int(rng.integers(2, 5))
        entries.append({
            "lattice": (np.eye(3) * rng.uniform(3.5, 4.5)
                        + rng.standard_normal((3, 3)) * 0.1),
            "frac_coords": rng.random((na, 3)),
            "species": [species_pool[int(x)]
                        for x in rng.integers(0, 4, na)],
            "data": {"id": f"{i},1", "e_above_hull": float(rng.random()),
                     "e_form": float(rng.standard_normal())},
        })
    return entries


@pytest.mark.slow
def test_cli_end_to_end(tmp_path):
    src = tmp_path / "raw.pickle.gz"
    with gzip.open(src, "wb") as f:
        pickle.dump(make_structures(), f)

    # prepare
    rc = cli_prepare.main(["--file", "raw.pickle.gz",
                           "--source-dir", str(tmp_path),
                           "--target-dir", str(tmp_path),
                           "--target-file", "prepared.pickle.gz",
                           "--max-nbr", "6"])
    assert rc == 0
    prepared = tmp_path / "prepared.pickle.gz"
    assert prepared.exists()

    # train (tiny model, smoke test)
    ckpt_dir = tmp_path / "logs"
    rc = cli_train.main([
        "--data-path", str(prepared), "--target", "e_above_hull",
        "--max-nbr", "6", "--atom-fea-len", "8", "--n-graph", "1",
        "--nbr-embedding-size", "8", "--msg-heads", "2",
        "--n-graph-roost", "1", "--batch-size", "4", "--node-bucket", "8",
        "--smoke-test", "--ckpt-dir", str(ckpt_dir),
        "--run-name", "e2e", "--learning-rate", "1e-3"])
    assert rc == 0
    run_dir = ckpt_dir / "runs" / "e2e"
    assert (run_dir / "checkpoints" / "best.json").exists()
    metrics = [json.loads(l) for l in
               open(run_dir / "metrics.jsonl").read().splitlines()]
    assert any("val_mae" in m for m in metrics)

    # evaluate
    rc = cli_eval.main([str(run_dir)])
    assert rc == 0

    # predict
    out = tmp_path / "preds.pickle.gz"
    rc = cli_predict.main([str(run_dir), str(prepared), "--out", str(out),
                           "--target", "e_above_hull"])
    assert rc == 0
    with gzip.open(out, "rb") as f:
        preds = pickle.load(f)
    assert len(preds["pred"]) == len(preds["ids"])
    assert np.all(np.isfinite(preds["pred"]))


def test_reference_flag_aliases():
    """Every flag a reference training script passes parses here with the
    reference's semantics (train.py:86-131, lightning_module.py:426-593)."""
    import argparse

    from cgat_tpu.cli.common import (add_model_args, add_trainer_args,
                                     configs_from_args)

    p = argparse.ArgumentParser()
    add_trainer_args(p)
    add_model_args(p)
    args = p.parse_args([
        "--gpus", "2", "--first-gpu", "0", "--distributed_backend", "ddp",
        "--amp_optimization", "01", "--workers", "4", "--train", "--test",
        "--mean-pooling", "--std-loss", "--update_edges",
        "--acc_batches", "3", "--lr", "2e-4",
    ])
    assert args.devices == 2              # --gpus -> data-parallel devices
    assert args.mean_pool_heads is True   # inverted store_false alias
    assert args.robust_loss is False      # --std-loss disables robust loss
    assert args.update_edges is False     # reference inverting alias
    assert args.acc_batches == 3
    tcfg, mcfg = configs_from_args(args)
    assert mcfg.compute_dtype == "bfloat16"   # apex level 01 -> bf16
    assert mcfg.mean_pooling is True
    assert mcfg.update_edges is False
    assert tcfg.learning_rate == 2e-4
    assert tcfg.acc_batches == 3

    # defaults stay the reference's effective defaults when nothing passed —
    # except precision: the PRODUCTION default is bf16 compute + f32 params
    # (benchmarked config, convergence parity in docs/PERFORMANCE.md;
    # hardware-certified every round by bench.py verify_production).
    # Reference-parity f32 runs pass --precision float32 explicitly.
    p2 = argparse.ArgumentParser()
    add_trainer_args(p2)
    add_model_args(p2)
    d = p2.parse_args([])
    assert d.devices == 0 and d.update_edges is True and d.clr is True
    _, m2 = configs_from_args(d)
    assert m2.compute_dtype == "bfloat16"
    d32 = p2.parse_args(["--precision", "float32"])
    _, m32 = configs_from_args(d32)
    assert m32.compute_dtype == "float32"
