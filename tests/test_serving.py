"""Serving artifact: export -> load -> predict without model re-tracing."""
import json
import os

import numpy as np

from cgat_tpu.data.synthetic import random_graphs
from cgat_tpu.models import CGATConfig
from cgat_tpu.serving import export_artifact, load_artifact
from cgat_tpu.training import Trainer, TrainerConfig

from test_training import TINY_MODEL, make_trainer


def _trained_run(tmp_path):
    trainer, graphs = make_trainer(ckpt_dir=str(tmp_path))
    trainer.fit(epochs=2)
    return trainer, graphs, trainer.last_log_dir


def test_export_load_predict_matches_trainer(tmp_path):
    trainer, graphs, run_dir = _trained_run(tmp_path)
    out = str(tmp_path / "artifact")
    manifest = export_artifact(run_dir, out, platforms=["cpu"],
                               node_buckets=[16, 32])
    assert os.path.exists(os.path.join(out, "manifest.json"))
    assert os.path.exists(os.path.join(out, "params.npz"))
    assert len(manifest["signatures"]) == 2
    for sig in manifest["signatures"]:
        for fname in sig["files"].values():
            assert os.path.exists(os.path.join(out, fname))

    served = load_artifact(out)
    # 10 graphs with batch 4 -> two full batches + a padded tail; every
    # crystal must get a prediction, in input order
    preds, log_stds = served.predict(graphs[:10])
    assert preds.shape == (10,) and log_stds.shape == (10,)

    from cgat_tpu.training.trainer import CheckpointManager
    params, _ = CheckpointManager.load(run_dir)
    want = trainer.predict(params, graphs[:10])
    # padding-invariance holds across bucketings, so the artifact's fixed
    # signatures must reproduce the live trainer's predictions
    np.testing.assert_allclose(preds, want, rtol=1e-4, atol=1e-5)


def test_artifact_embeddings_and_bucket_selection(tmp_path):
    _, graphs, run_dir = _trained_run(tmp_path)
    out = str(tmp_path / "artifact")
    export_artifact(run_dir, out, platforms=["cpu"], node_buckets=[16, 32],
                    batch_size=6)
    served = load_artifact(out)
    preds, _, embs = served.predict(graphs[:6], return_embeddings=True)
    assert preds.shape == (6,)
    assert embs.shape == (6, CGATConfig(**TINY_MODEL).embedding_dim)
    # a batch too big for every signature fails loudly
    big = random_graphs(1, 6, n_atoms_range=(8, 9), max_nbr=4, orig_fea=16)
    try:
        served.predict(big)
        raised = False
    except ValueError as e:
        raised = "node slots" in str(e)
    assert raised


def test_export_cli(tmp_path):
    _, graphs, run_dir = _trained_run(tmp_path)
    out = str(tmp_path / "artifact")
    from cgat_tpu.cli import export as cli_export
    rc = cli_export.main([run_dir, out, "--platforms", "cpu",
                          "--node-buckets", "32"])
    assert rc == 0
    manifest = json.load(open(os.path.join(out, "manifest.json")))
    assert manifest["platforms"] == ["cpu"]
    served = load_artifact(out)
    preds, _ = served.predict(graphs[:4])
    assert np.isfinite(preds).all()


def test_export_carries_pallas_on_tpu_and_xla_on_cpu(tmp_path):
    """r4 verdict ask 8: the exported StableHLO must run the fused Mosaic
    kernels on TPU targets and the plain XLA path on CPU targets —
    regardless of the exporting host (here: a CPU host lowering for TPU,
    where the wrappers' host-based interpret default would otherwise ship
    the Pallas interpreter)."""
    from jax import export as jexport
    # kernel-eligible dims (heads*fea = 128) so the TPU lowering really
    # contains the fused segment-attention custom calls; TINY_MODEL's 2x8
    # falls back to XLA on every backend
    graphs = random_graphs(0, 24, n_atoms_range=(3, 6), max_nbr=4,
                           orig_fea=16)
    cfg = TrainerConfig(batch_size=4, epochs=2, node_bucket=8,
                        check_val_every_n_epoch=2, num_comp_slots=8,
                        max_nbr=4, learning_rate=3e-3,
                        ckpt_dir=str(tmp_path))
    mcfg = CGATConfig(**dict(TINY_MODEL, elem_fea_len=64,
                             nbr_embedding_size=64))
    trainer = Trainer(cfg, mcfg, graphs)
    trainer.fit(epochs=2)
    run_dir = trainer.last_log_dir
    out = str(tmp_path / "artifact_xplat")
    manifest = export_artifact(run_dir, out, platforms=["tpu", "cpu"],
                               node_buckets=[32])
    sig = manifest["signatures"][0]
    mods = {}
    for plat, fname in sig["files"].items():
        with open(os.path.join(out, fname), "rb") as f:
            mods[plat] = jexport.deserialize(f.read()).mlir_module()
    assert "tpu_custom_call" in mods["tpu"], \
        "TPU module does not carry Mosaic kernels"
    assert "tpu_custom_call" not in mods["cpu"]
    # loading on this (CPU) host picks the CPU module and still predicts
    served = load_artifact(out)
    preds, _ls = served.predict(graphs[:4])
    assert preds.shape == (4,) and np.isfinite(preds).all()
