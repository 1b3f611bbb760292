"""Learning-rate schedules (reference: CGAT/utils.py:50-116,
lightning_module.py:340-354).

The reference steps its schedulers once per *epoch* (PyTorch-Lightning
default). Here schedules are plain ``epoch -> lr_multiplier`` functions the
trainer evaluates host-side each epoch and injects into the optimizer via
``optax.inject_hyperparams`` — no recompilation, exact epoch-level semantics.
"""
from __future__ import annotations

import math


def cyclical_lr(period: int = 100, cycle_mul: float = 0.2,
                tune_mul: float = 0.05):
    """Triangular cyclic multiplier in [cycle_mul, 1] (utils.py:50-64).

    ``tune_mul`` is accepted for signature parity but — as in the reference —
    unused by the returned lambda.
    """
    def relative(it, stepsize):
        cycle = math.floor(1 + it / period)
        x = abs(2 * (it / period - cycle) + 1)
        return max(0.0, 1.0 - x)

    return lambda it: cycle_mul + (1.0 - cycle_mul) * relative(it, period)


def linear_range_test(base_lr: float, end_lr: float, num_iter: int):
    """LinearLR range-test schedule (utils.py:67-90): absolute lr per epoch."""
    def sched(it):
        r = (it + 1) / num_iter
        return base_lr + r * (end_lr - base_lr)
    return sched


def exponential_range_test(base_lr: float, end_lr: float, num_iter: int):
    """ExponentialLR range-test schedule (utils.py:93-116)."""
    def sched(it):
        r = (it + 1) / num_iter
        return base_lr * (end_lr / base_lr) ** r
    return sched


class ReduceLROnPlateau:
    """Host-side plateau scheduler matching torch defaults used by the
    reference (lightning_module.py:346-354): mode=min, factor=0.1, patience=5,
    threshold=2e-4 relative."""

    def __init__(self, factor=0.1, patience=5, threshold=2e-4,
                 cooldown=0, eps=1e-8):
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.cooldown = cooldown
        self.eps = eps
        self.best = float("inf")
        self.num_bad = 0
        self.cooldown_counter = 0
        self.scale = 1.0

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        elif self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                new_scale = self.scale * self.factor
                if self.scale - new_scale > self.eps:
                    self.scale = new_scale
                self.cooldown_counter = self.cooldown
                self.num_bad = 0
        return self.scale
