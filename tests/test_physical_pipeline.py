"""End-to-end pipeline on PHYSICAL structures (perturbed lattice prototypes),
not random integer graphs: structures -> `prepare` CLI (periodic kNN + shell
indices) -> `train-CGAT` CLI -> predictions -> GP -> error ranking.

This is the offline stand-in for the reference's dcgat walkthrough
(reference README.md:58-86): everything flows through the same code paths a
real dcgat pickle would take — including the featuriser, which the synthetic
random-graph tests bypass entirely.
"""
import gzip
import json
import os
import pickle

import numpy as np
import pytest

from cgat_tpu.data.structures import PROTOTYPES, random_structures

MODEL_ARGS = [
    "--atom-fea-len", "16", "--n-graph", "2", "--nbr-embedding-size", "16",
    "--msg-heads", "2", "--n-graph-roost", "1", "--devices", "1",
]


def test_prototype_structures_featurise():
    """Every prototype survives periodic kNN at max_nbr=24 and produces
    monotone shell indices with the expected coordination in shell 1."""
    from cgat_tpu.data.featurizer import periodic_neighbors
    rng = np.random.default_rng(0)
    from cgat_tpu.data.structures import make_structure
    for kind in PROTOTYPES:
        s = make_structure(rng, kind, noise=0.0, strain=0.0)
        res = periodic_neighbors(s["lattice"], s["frac_coords"], max_nbr=24)
        assert res is not None, kind
        nbr, shell, dist = res
        assert shell.shape == (len(s["species"]), 24)
        assert (shell[:, 0] == 1).all()
        assert (np.diff(shell, axis=1) >= 0).all()
        assert (np.diff(dist, axis=1) >= -1e-12).all()
    # ideal rocksalt: every atom has 6 nearest neighbors in shell 1
    s = make_structure(np.random.default_rng(1), "rocksalt", noise=0.0,
                       strain=0.0)
    _, shell, _ = periodic_neighbors(s["lattice"], s["frac_coords"],
                                     max_nbr=24)
    assert ((shell == 1).sum(axis=1) == 6).all()


@pytest.mark.slow
def test_full_pipeline_on_physical_structures(tmp_path):
    """prepare -> train -> predict -> GP -> error ranking on perturbed
    prototypes, all through the public CLIs / tools."""
    from cgat_tpu.cli import prepare as cli_prepare
    from cgat_tpu.cli import train as cli_train

    # -- structures + prepare (the reference `prepare` flow)
    structures = random_structures(0, 90, noise=0.015, strain=0.02)
    raw = str(tmp_path / "raw.pickle.gz")
    with gzip.open(raw, "wb") as f:
        pickle.dump(structures, f)
    assert cli_prepare.main([
        "--file", "raw.pickle.gz", "--source-dir", str(tmp_path),
        "--target-dir", str(tmp_path), "--target-file", "prep.pickle.gz",
    ]) == 0
    with gzip.open(tmp_path / "prep.pickle.gz", "rb") as f:
        prep = pickle.load(f)
    assert len(prep["batch_ids"]) == 90  # nothing rejected

    # -- train through the CLI (short run, plateau schedule)
    run_dir = str(tmp_path / "tb")
    assert cli_train.main([
        "--data-path", str(tmp_path / "prep.pickle.gz"),
        "--target", "e_above_hull", "--epochs", "8", "--batch-size", "8",
        "--node-bucket", "16", "--clr-period", "4", "--ckpt-dir", run_dir,
        "--run-name", "phys", "--learning-rate", "3e-3",
        *MODEL_ARGS,
    ]) == 0

    # -- reload + predict: must beat the predict-the-mean baseline on the
    # val split (the target carries real composition signal)
    from cgat_tpu.training.trainer import load_trainer
    run = os.path.join(run_dir, "runs", "phys")
    trainer, params, meta = load_trainer(run, train=True)
    val = trainer.val_graphs + trainer.test_graphs
    m = trainer.evaluate_split(params, val)
    baseline = float(np.mean(np.abs(
        np.asarray([g.target for g in val]) - trainer.mean)))
    assert np.isfinite(m["mae"])
    assert m["mae"] < baseline, (m, baseline)

    # -- embeddings -> GP uncertainty head on the frozen backbone
    from cgat_tpu.uncertainty.gp import (confidence_region, fit_gp,
                                         gp_predict_f)
    emb = trainer.embeddings(params, trainer.train_graphs)
    y = np.asarray([g.target for g in trainer.train_graphs], np.float32)
    y_norm = (y - trainer.mean) / trainer.std
    gp_params, hist = fit_gp(emb, y_norm, num_inducing=16, epochs=30,
                             batch_size=32, verbose=False)
    assert hist[-1] < hist[0]  # ELBO improved
    emb_val = trainer.embeddings(params, val)
    mu, var = gp_predict_f(gp_params, emb_val)
    lo, hi = confidence_region(mu, var)
    assert np.isfinite(np.asarray(mu)).all()
    assert (np.asarray(hi) >= np.asarray(lo)).all()

    # -- active-learning style error ranking over a fresh candidate pool
    pool = random_structures(99, 30, noise=0.015, strain=0.02)
    from cgat_tpu.data.featurizer import build_dataset_prepare
    from cgat_tpu.data.dataset import load_prepared
    pool_prep = build_dataset_prepare(pool, progress=False)
    pool_graphs = load_prepared(pool_prep, target="e_above_hull")
    preds = trainer.predict(params, pool_graphs)
    errs = np.abs(preds - np.asarray([g.target for g in pool_graphs]))
    top = np.argsort(errs)[::-1][:10]
    assert len(set(top)) == 10 and np.isfinite(errs).all()
