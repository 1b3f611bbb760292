"""Analysis utilities: ensemble prediction export, GP prediction CSVs, t-SNE
(reference: Utilities/prediction.py, gp_predict.py, tsne.py,
errors_of_additional_data.py).
"""
from __future__ import annotations

import csv
import os

import numpy as np

from .shards import load_pickle


def ensemble_predict(ckpt_dirs, data_paths, out_dir, *,
                     export_embeddings: bool = False):
    """Per-dataset predictions (or embeddings) for each checkpoint of a seed
    ensemble, written as text files like Utilities/prediction.py:30-68."""
    from ..data.dataset import load_prepared
    from ..training.trainer import load_trainer

    for ckpt in ckpt_dirs:
        trainer, params, meta = load_trainer(ckpt, train=False)
        seed = trainer.cfg.seed
        for path in data_paths:
            data = load_pickle(path)
            graphs = load_prepared(data, fea_path=trainer.cfg.fea_path,
                                   max_neighbor_number=trainer.cfg.max_nbr,
                                   target=trainer.cfg.target)
            comp = os.path.splitext(os.path.basename(path))[0]
            d = os.path.join(out_dir, comp)
            os.makedirs(d, exist_ok=True)
            if export_embeddings:
                np.savetxt(os.path.join(d, "graph_embeddings.txt"),
                           trainer.embeddings(params, graphs))
            else:
                preds = trainer.predict(params, graphs)
                np.savetxt(os.path.join(d, f"{seed}.txt"), preds.reshape(-1))
                np.savetxt(os.path.join(d, "target.txt"),
                           np.asarray([g.target for g in graphs]))


def gp_predict_csv(gp_path: str, data_paths, *, target: str = "e_above_hull_new"):
    """GP predictions + uncertainty (upper - mean) + |error| per embedding
    dataset, written as gp_results.csv next to the data
    (Utilities/gp_predict.py:11-36)."""
    import jax.numpy as jnp

    from ..uncertainty.gp import (GPConfig, confidence_region, gp_predict_f,
                                  load_gp)

    params, d = load_gp(gp_path)
    cfg = GPConfig(zero_mean=d.get("zero_mean", False))
    mean, std = d["mean"], d["std"]
    for path in data_paths:
        data = load_pickle(path)
        x = np.asarray(data["input"], np.float32)
        y = np.asarray(data["target"][target], np.float32).reshape(-1)
        mu, var = gp_predict_f(params, jnp.asarray(x), cfg)
        pred = np.asarray(mu) * std + mean
        _, upper = confidence_region(mu, var)
        upper = np.asarray(upper) * std + mean
        out = os.path.join(os.path.dirname(path), "gp_results.csv")
        with open(out, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["prediction", "uncertainty", "absolute error"])
            for p, u, t in zip(pred, upper - pred, np.abs(pred - y)):
                w.writerow([float(p), float(u), float(t)])


def tsne_embed(embeddings: np.ndarray, *, n_components: int = 2,
               perplexity: float = 30.0, seed: int = 0) -> np.ndarray:
    """2-D t-SNE of graph embeddings (Utilities/tsne.py). Uses openTSNE when
    installed, else sklearn."""
    try:
        from openTSNE import TSNE
        return np.asarray(TSNE(n_components=n_components,
                               perplexity=perplexity,
                               random_state=seed).fit(embeddings))
    except ImportError:
        from sklearn.manifold import TSNE
        return TSNE(n_components=n_components, perplexity=perplexity,
                    random_state=seed, init="pca").fit_transform(embeddings)
