"""Matched-MAE anchor: the ACTUAL reference trainer vs cgat_tpu on the same
featurized physical-structure dataset, same split / normalization / schedule.

The strongest available end-to-end evidence without the (unreachable) dcgat
data: both trainers consume the identical prepared pickle; the reference side
is the real `CGAT.lightning_module.LightningModel` running under pure-torch
shims (tests/reference_trainer.py), the cgat_tpu side is the production
Trainer. Split + normalization must agree EXACTLY (same sklearn calls, same
seed); final val MAEs must both beat the predict-the-mean baseline and land
within noise of each other.
"""
import gzip
import pickle

import numpy as np
import pytest

import reference_trainer as RT

EPOCHS = 12
LR = 3e-3
BATCH = 32
N_STRUCTURES = 220


@pytest.fixture(scope="module")
def prepared_path(tmp_path_factory):
    from cgat_tpu.data.featurizer import build_dataset_prepare
    from cgat_tpu.data.structures import random_structures
    structures = random_structures(0, N_STRUCTURES, noise=0.015, strain=0.02)
    prep = build_dataset_prepare(structures, progress=False)
    p = tmp_path_factory.mktemp("anchor") / "prep.pickle.gz"
    with gzip.open(p, "wb") as f:
        pickle.dump(prep, f)
    return str(p)


@pytest.fixture(scope="module")
def reference_run(prepared_path):
    hp = RT.reference_hparams(prepared_path, epochs=EPOCHS,
                              learning_rate=LR, batch_size=BATCH,
                              clr_period=6)
    model, history = RT.train_reference(hp, record_every=2)
    return model, history


@pytest.fixture(scope="module")
def tpu_run(prepared_path):
    from cgat_tpu.data.dataset import load_prepared
    from cgat_tpu.models import CGATConfig
    from cgat_tpu.training import Trainer, TrainerConfig
    graphs = load_prepared(prepared_path, target="e_above_hull")
    tcfg = TrainerConfig(batch_size=BATCH, epochs=EPOCHS, learning_rate=LR,
                         clr=True, clr_period=6, target="e_above_hull",
                         seed=0, check_val_every_n_epoch=2, node_bucket=64,
                         ckpt_dir="")
    mcfg = CGATConfig(elem_fea_len=16, n_graph=2, nbr_embedding_size=128,
                      msg_heads=2, n_graph_roost=1)
    trainer = Trainer(tcfg, mcfg, graphs)
    state = trainer.fit()
    m = trainer.evaluate_split(state.params, trainer.val_graphs)
    return trainer, float(m["mae"])


def test_split_and_normalization_match_reference(reference_run, tpu_run):
    """Same sklearn split calls + same seed => bitwise-identical train
    subsets, hence identical normalization statistics."""
    model, _ = reference_run
    trainer, _ = tpu_run
    np.testing.assert_allclose(trainer.mean, float(model.mean), rtol=1e-5)
    np.testing.assert_allclose(trainer.std, float(model.std), rtol=1e-5)


def test_final_mae_within_noise_of_reference(reference_run, tpu_run):
    model, history = reference_run
    _, tpu_mae = tpu_run
    ref_mae = history[-1][1]
    baseline = RT.predict_mean_baseline(model)
    assert ref_mae < baseline, (ref_mae, baseline)
    assert tpu_mae < baseline, (tpu_mae, baseline)
    # same data, same schedule, independent frameworks: final MAEs agree
    # within run-to-run noise (different init RNG + float orders)
    assert abs(ref_mae - tpu_mae) < 0.5 * max(ref_mae, tpu_mae), (
        ref_mae, tpu_mae)
    print(f"reference val MAE={ref_mae:.4f}  cgat_tpu val MAE={tpu_mae:.4f} "
          f"baseline={baseline:.4f}")
