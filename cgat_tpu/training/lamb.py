"""LAMB optimizer as an optax GradientTransformation.

Matches the reference's fused ``lamb_kernel`` semantics exactly
(reference: CGAT/lambs.py:155-181): no bias correction, eps inside the adam
denominator, weight decay added to the adam step (not decoupled), per-tensor
trust ratio with the weight norm clamped to [0, 10] and 1.0 fallbacks for
zero norms. The reference's TorchScript JIT fusion is free here — XLA fuses
the whole update.
"""
from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax


class LambState(NamedTuple):
    exp_avg: chex.ArrayTree
    exp_avg_sq: chex.ArrayTree


def lamb(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
         eps: float = 1e-6, weight_decay: float = 0.0) -> optax.GradientTransformation:
    def init_fn(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return LambState(exp_avg=zeros,
                         exp_avg_sq=jax.tree.map(jnp.zeros_like, params))

    def update_fn(grads, state, params):
        exp_avg = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                               state.exp_avg, grads)
        exp_avg_sq = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                                  state.exp_avg_sq, grads)

        def per_tensor(p, m, v):
            adam_step = m / (jnp.sqrt(v) + eps) + weight_decay * p
            weight_norm = jnp.clip(jnp.linalg.norm(p.reshape(-1)), 0.0, 10.0)
            adam_norm = jnp.linalg.norm(adam_step.reshape(-1))
            trust = weight_norm / (adam_norm + eps)
            trust = jnp.where(weight_norm == 0.0, 1.0, trust)
            trust = jnp.where(adam_norm == 0.0, 1.0, trust)
            return -learning_rate * trust * adam_step

        updates = jax.tree.map(per_tensor, params, exp_avg, exp_avg_sq)
        return updates, LambState(exp_avg, exp_avg_sq)

    return optax.GradientTransformation(init_fn, update_fn)
