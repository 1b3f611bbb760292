"""Seed-ensemble orchestration: train members -> predict -> aggregate."""
import gzip
import os
import pickle

import numpy as np
import pytest

from cgat_tpu.cli import prepare as cli_prepare
from cgat_tpu.tools import ensemble

from test_cli import make_structures


@pytest.mark.slow
def test_ensemble_train_predict_summarize(tmp_path):
    src = tmp_path / "raw.pickle.gz"
    with gzip.open(src, "wb") as f:
        pickle.dump(make_structures(), f)
    rc = cli_prepare.main(["--file", "raw.pickle.gz",
                           "--source-dir", str(tmp_path),
                           "--target-dir", str(tmp_path),
                           "--target-file", "prepared.pickle.gz",
                           "--max-nbr", "6"])
    assert rc == 0
    prepared = str(tmp_path / "prepared.pickle.gz")
    ckpt_dir = str(tmp_path / "logs")

    train_args = [
        "--data-path", prepared, "--target", "e_above_hull",
        "--max-nbr", "6", "--atom-fea-len", "8", "--n-graph", "1",
        "--nbr-embedding-size", "8", "--msg-heads", "2",
        "--n-graph-roost", "1", "--batch-size", "4", "--node-bucket", "8",
        "--smoke-test", "--learning-rate", "1e-3"]
    rc = ensemble.main(["train", "--seeds", "0", "1",
                        "--ckpt-dir", ckpt_dir, "--"] + train_args)
    assert rc == 0
    members = ensemble.find_members(ckpt_dir)
    assert len(members) == 2
    assert {os.path.basename(m) for m in members} == {"ens_f-0", "ens_f-1"}

    out_dir = str(tmp_path / "preds")
    rc = ensemble.main(["predict", "--ckpt-dir", ckpt_dir,
                        "--out-dir", out_dir, "--data", prepared])
    assert rc == 0
    ds = os.path.join(out_dir, "prepared.pickle")
    assert os.path.exists(os.path.join(ds, "0.txt"))
    assert os.path.exists(os.path.join(ds, "1.txt"))

    results = ensemble.summarize(out_dir)
    assert list(results) == ["prepared.pickle"]
    assert np.isfinite(results["prepared.pickle"])
    # members differ (different seeds) so the spread column is non-zero
    rows = np.loadtxt(os.path.join(ds, "ensemble.csv"), delimiter=",",
                      skiprows=1)
    assert rows.shape[1] == 3
    assert np.any(rows[:, 1] > 0)
    # ensemble mean equals the member average
    m0 = np.loadtxt(os.path.join(ds, "0.txt"))
    m1 = np.loadtxt(os.path.join(ds, "1.txt"))
    np.testing.assert_allclose(rows[:, 0], (m0 + m1) / 2, rtol=1e-6)

    # model soup: average the two members into one servable model
    soup_run = str(tmp_path / "logs" / "runs" / "soup")
    rc = ensemble.main(["soup", "--ckpt-dir", ckpt_dir,
                        "--out-run", soup_run])
    assert rc == 0
    from cgat_tpu.training.trainer import CheckpointManager, load_trainer
    p_soup, meta = CheckpointManager.load(soup_run, tag="best")
    assert meta["soup_members"] == ["ens_f-0", "ens_f-1"]
    p0, _ = CheckpointManager.load(members[0], tag="best")
    p1, _ = CheckpointManager.load(members[1], tag="best")
    np.testing.assert_allclose(
        np.asarray(p_soup["embedding"]["kernel"]),
        (np.asarray(p0["embedding"]["kernel"])
         + np.asarray(p1["embedding"]["kernel"])) / 2, rtol=1e-6)
    # the averaged model predicts finitely through the normal load path
    from cgat_tpu.data.dataset import load_prepared
    trainer, params, _ = load_trainer(soup_run, train=False)
    graphs = load_prepared(prepared, max_neighbor_number=6,
                           target="e_above_hull")
    preds = trainer.predict(params, graphs)
    assert np.all(np.isfinite(preds))
