"""Drive the ACTUAL reference training loop (lightning_module.py) on CPU.

With the `ref_shims` fakes installed, `CGAT.lightning_module.LightningModel`
constructs and runs unmodified: real CompositionData loading, real sklearn
splits + normalization (lightning_module.py:78-128), real `evaluate` /
`training_step` (lightning_module.py:185-259), real `configure_optimizers`
(306-355). This module adds only what PyTorch-Lightning's Trainer would
otherwise do: the epoch loop (optimizer.zero_grad / backward / step, one
scheduler step per epoch — PL's default 'epoch' interval) and a direct
val-MAE evaluation. Used by the matched-MAE anchor test and the
docs/PERFORMANCE.md comparison.
"""
from __future__ import annotations

from argparse import Namespace

import numpy as np
import torch

import ref_shims

ref_shims.install()

MATSCHOLAR = "/root/reference/embeddings/matscholar-embedding.json"


def reference_hparams(data_path: str, *, atom_fea_len=16, n_graph=2,
                      msg_heads=2, n_graph_roost=1, batch_size=32,
                      learning_rate=3e-3, epochs=12, clr_period=6,
                      seed=0, target="e_above_hull", max_nbr=24,
                      test_size=0.1, val_size=0.1) -> Namespace:
    """The reference trainer's effective-default argparse namespace
    (lightning_module.py:426-593 store_false booleans resolved: the stored
    flag values are the *declared* defaults, e.g. mean_pooling=True, which
    LightningModel negates when building the model)."""
    return Namespace(
        train=True, data_path=data_path, fea_path=MATSCHOLAR,
        max_nbr=max_nbr, target=target, test_path=None, val_path=None,
        seed=seed, test_size=test_size, val_size=val_size,
        train_percentage=0.0,
        std_loss=True, loss="L1",            # default: plain L1 on norm target
        version="CGAT.CGAT",
        atom_fea_len=atom_fea_len, n_graph=n_graph, rezero=True,
        mean_pooling=True,                   # negated by the trainer
        msg_heads=msg_heads, update_edges=True, vector_attention=True,
        global_vector_attention=True, n_graph_roost=n_graph_roost,
        batch_size=batch_size, workers=0, only_residual=False,
        optim="AdamW", learning_rate=learning_rate, weight_decay=1e-6,
        momentum=0.9, clr=True, clr_period=clr_period, epochs=epochs,
    )


def val_mae(model) -> float:
    """Direct denormalised val-split MAE (the quantity behind 'val_mae',
    lightning_module.py:261-280), evaluated over the WHOLE val subset (no
    drop_last) so it is exact."""
    model.eval()
    abs_err, n = 0.0, 0
    items = [model.val_subset[i] for i in range(len(model.val_subset))]
    bs = model.hparams.batch_size
    with torch.no_grad():
        for i in range(0, len(items), bs):
            batch = items[i:i + bs]
            _, _, pred, target, _ = model.evaluate(batch)
            abs_err += float((pred - target).abs().sum())
            n += len(batch)
    return abs_err / max(n, 1)


def train_reference(hparams: Namespace, *, record_every=1):
    """Manual PL-equivalent fit loop. Returns (model, history) where history
    is a list of (epoch, val_mae)."""
    from CGAT.lightning_module import LightningModel  # real source

    torch.manual_seed(hparams.seed)
    model = LightningModel(hparams)
    (opt,), (sched,) = model.configure_optimizers()
    history = []
    for epoch in range(hparams.epochs):
        model.train()
        loader = model.train_dataloader()
        for i, batch in enumerate(loader):
            opt.zero_grad()
            loss = model.training_step(batch, i)
            loss.backward()
            opt.step()
        sched.step()
        if (epoch + 1) % record_every == 0 or epoch == hparams.epochs - 1:
            history.append((epoch + 1, val_mae(model)))
    return model, history


def predict_mean_baseline(model) -> float:
    """Val MAE of always predicting the training mean."""
    items = [model.val_subset[i] for i in range(len(model.val_subset))]
    ys = np.concatenate([item[0].y.reshape(-1).numpy() for item in items])
    return float(np.mean(np.abs(ys - float(model.mean))))
