"""Active-learning round orchestration (reference SURVEY.md section 3.5).

The reference runs its active-learning loop as a chain of standalone scripts
(sample.py -> train.sh -> calculate_errors.py -> get_highest_errors.py ->
retrain). This module ties the cgat_tpu equivalents into one callable round:

  1. (first round) draw the initial candidate sample from the pool
     (random or Metropolis element-balanced), excluding test/val ids;
  2. train (or fine-tune) a model on the accumulated sample;
  3. rank the remaining pool by per-sample error with the trained model;
  4. move the top-N errors from the pool into the training sample.

Each step is also usable on its own (cgat_tpu.tools.sample / errors).
"""
from __future__ import annotations

import os

from . import shards
from .errors import calculate_errors, get_highest_errors
from .sample import (extract_sample, metropolis_sample, random_sample,
                     scan_pool)


def initial_sample(pool_dir: str, out_dir: str, n: int, *,
                   method: str = "random", seed: int = 1,
                   exclude_ids: set[str] | None = None,
                   n_shards: int | None = None):
    """Step 1: draw the first training sample and rewrite the pool without it
    (Utilities/sample.py main flow). Returns the merged prepared dict."""
    ids, element_sets, stoich = scan_pool(pool_dir, exclude_ids=exclude_ids,
                                          n_shards=n_shards)
    if method == "metropolis":
        chosen = metropolis_sample(ids, element_sets, stoich, n, seed=seed)
    else:
        chosen = random_sample(ids, n, seed=seed)
    return extract_sample(pool_dir, out_dir, chosen, n_shards=n_shards)


def active_learning_round(pool_dir: str, sample_path: str, *,
                          trainer_cfg, model_cfg,
                          n_new: int = 25000,
                          pretrained_run: str | None = None,
                          n_shards: int | None = None,
                          target: str | None = None):
    """Steps 2-4: train on the current sample, rank the pool, absorb the
    top-N errors into the sample. Returns (run_dir, new_sample_dict).

    ``sample_path`` is a prepared .pickle.gz holding the accumulated training
    sample; it is rewritten with the newly selected entries appended."""
    from ..data.dataset import load_prepared
    from ..training.trainer import Trainer, load_trainer

    graphs = load_prepared(sample_path, fea_path=trainer_cfg.fea_path,
                           max_neighbor_number=trainer_cfg.max_nbr,
                           target=target or trainer_cfg.target)
    if pretrained_run:
        old, params, _ = load_trainer(pretrained_run, train=False)
        trainer = Trainer(trainer_cfg, old.model_cfg, graphs)
        state = trainer.init_state(params=params)
        trainer.fit(state)
    else:
        trainer = Trainer(trainer_cfg, model_cfg, graphs)
        trainer.fit()
    run_dir = trainer.last_log_dir

    calculate_errors(run_dir, pool_dir, n_shards=n_shards,
                     target=target or trainer_cfg.target)
    new_sample = get_highest_errors(pool_dir, n=n_new, n_shards=n_shards)
    if new_sample is not None:
        old_sample = shards.load_pickle(sample_path)
        merged = shards.merge_prepared([old_sample, new_sample])
        shards.save_pickle(merged, sample_path)
    return run_dir, new_sample
