"""GP CLI end-to-end: tiny CGAT checkpoint -> embeddings -> SVGP -> csv."""
import gzip
import pickle

import numpy as np
import pytest

from cgat_tpu.cli import train_gp as cli_gp
from cgat_tpu.data.synthetic import random_graphs
from cgat_tpu.models import CGATConfig
from cgat_tpu.training import Trainer, TrainerConfig

TINY = dict(orig_elem_fea_len=16, elem_fea_len=8, n_graph=1,
            nbr_embedding_size=8, neighbor_number=4, msg_heads=2,
            n_graph_roost=1, out_hidden=(8,))


@pytest.mark.slow
def test_train_gp_from_checkpoint(tmp_path, monkeypatch):
    graphs = random_graphs(0, 30, n_atoms_range=(3, 6), max_nbr=4,
                           orig_fea=16)
    cfg = TrainerConfig(batch_size=4, epochs=2, node_bucket=8, max_nbr=4,
                        num_comp_slots=8, ckpt_dir=str(tmp_path),
                        run_name="gp-e2e", learning_rate=1e-3)
    trainer = Trainer(cfg, CGATConfig(**TINY), graphs)
    trainer.fit()
    run_dir = trainer.last_log_dir

    # the CLI loads graphs from cfg.data_path; monkeypatch the loader to
    # return our synthetic graphs instead of reading files
    import cgat_tpu.uncertainty.gp as gp_mod
    monkeypatch.setattr(
        "cgat_tpu.data.dataset.load_dataset_dir",
        lambda *a, **k: graphs)
    out = tmp_path / "gp.pickle.gz"
    rc = cli_gp.main(["--cgat-model", run_dir, "--inducing-points", "8",
                      "--epochs", "5", "--batch-size", "8",
                      "--out", str(out)])
    assert rc == 0
    with gzip.open(out, "rb") as f:
        saved = pickle.load(f)
    assert np.isfinite(saved["val_mae"])
    assert saved["params"].inducing.shape[1] == CGATConfig(**TINY).embedding_dim

    # streaming mode: embeddings computed inside the GP step (reference
    # on-the-fly training, gaussian_process.py:241-296)
    out_fly = tmp_path / "gp_fly.pickle.gz"
    rc = cli_gp.main(["--cgat-model", run_dir, "--inducing-points", "8",
                      "--epochs", "2", "--batch-size", "8",
                      "--on-the-fly", "--out", str(out_fly)])
    assert rc == 0
    with gzip.open(out_fly, "rb") as f:
        saved_fly = pickle.load(f)
    assert np.isfinite(saved_fly["val_mae"])
    assert (saved_fly["params"].inducing.shape[1]
            == CGATConfig(**TINY).embedding_dim)

    # gp_predict csv flow on an embedding-format dataset
    from cgat_tpu.tools.analysis import gp_predict_csv
    from cgat_tpu.training.trainer import load_trainer
    tr2, params2, _ = load_trainer(run_dir, train=False)
    emb = tr2.embeddings(params2, graphs)
    data = {"input": emb,
            "batch_ids": [[f"{i},1"] for i in range(len(graphs))],
            "batch_comp": np.asarray(["x"] * len(graphs), dtype=object),
            "target": {"e_above_hull_new":
                       np.asarray([g.target for g in graphs])},
            "comps": np.asarray(["x"] * len(graphs), dtype=object)}
    emb_path = tmp_path / "emb.pickle.gz"
    with gzip.open(emb_path, "wb") as f:
        pickle.dump(data, f)
    gp_predict_csv(str(out), [str(emb_path)])
    assert (tmp_path / "gp_results.csv").exists()
