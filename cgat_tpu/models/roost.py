"""Roost composition model, dense per-crystal formulation (flax.linen).

Re-implementation of the reference's structure-agnostic composition GNN
(reference: CGAT/roost_message.py:88-321). The reference builds an explicit
edge list over the complete graph of each crystal's distinct elements
(data.py:90-96) and runs torch_scatter segment reductions; since that graph is
*complete* and tiny (R <= ~8 distinct elements), the TPU-native layout is a
dense masked ``(C, R, R)`` pairwise tensor — all reductions become plain
masked axis reductions on the VPU/MXU, with no scatters at all.

Numerics match the reference exactly, including the learnable ``weights**pow``
gate with 1e-13 denominator (roost_message.py:300-311) and the self-exclusion
(an element never messages itself: ``env_idx[:i] + env_idx[i+1:]``,
data.py:93-96).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import SimpleNetwork, TorchLinear

NEG_BIG = -1e30


def _randn_init(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


def weighted_attention_dense(gate, weights, pow_, mask, axis):
    """Masked dense version of WeightedAttention's gate normalisation
    (roost_message.py:305-311): max-subtracted exp, scaled by ``weights**pow``,
    normalised over ``axis`` with +1e-13.

    gate: (..., K, 1) raw scores; weights: broadcastable (..., K, 1);
    mask: bool broadcastable; returns normalised gate with zeros at masked slots.
    """
    gate = jnp.where(mask, gate, NEG_BIG)
    gmax = jnp.max(gate, axis=axis, keepdims=True)
    gmax = jnp.maximum(gmax, NEG_BIG)
    g = jnp.exp(gate - gmax)
    w = jnp.where(mask, weights, 1.0)  # avoid 0**negative at padded slots
    g = (w ** pow_) * g
    g = jnp.where(mask, g, 0.0)
    denom = jnp.sum(g, axis=axis, keepdims=True) + 1e-13
    return g / denom


def weighted_mean_pooling(fea, weights, mask, axis=1):
    """Weight-scaled masked mean over element slots
    (WeightedMeanPooling, roost_message.py:270-283)."""
    w = jnp.where(mask, weights, 0.0)
    num = jnp.sum(w[..., None] * fea, axis=axis)
    den = jnp.maximum(jnp.sum(mask, axis=axis, keepdims=True), 1)
    return num / den


class MessageLayer(nn.Module):
    """Composition message passing (roost_message.py:88-156), dense.

    For each crystal: pair features ``[fea_s, fea_t]`` for all ordered pairs
    s != t, attention gated by the *neighbour's* fractional weight, summed over
    neighbours t, residual added. Single head by default (reference
    ``msg_heads = 1``, roost_message.py:193).
    """
    fea_len: int
    num_heads: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, weights, fea, mask):
        # fea: (C, R, F); weights: (C, R); mask: (C, R)
        C, R, F = fea.shape
        pair = jnp.concatenate([
            jnp.broadcast_to(fea[:, :, None, :], (C, R, R, F)),   # self s
            jnp.broadcast_to(fea[:, None, :, :], (C, R, R, F)),   # neighbour t
        ], axis=-1)                                               # (C,R,R,2F)
        eye = jnp.eye(R, dtype=bool)
        pair_mask = (mask[:, :, None] & mask[:, None, :] & ~eye)[..., None]
        nbr_w = jnp.broadcast_to(weights[:, None, :, None], (C, R, R, 1))

        head_out = []
        for h in range(self.num_heads):
            gate = SimpleNetwork(1, [256], dtype=self.dtype,
                                 name=f"head{h}_gate_nn")(pair)     # (C,R,R,1)
            pow_ = self.param(f"head{h}_pow", _randn_init, (1,))
            g = weighted_attention_dense(gate, nbr_w, pow_, pair_mask, axis=2)
            msg = SimpleNetwork(self.fea_len, [256], dtype=self.dtype,
                                name=f"head{h}_message_nn")(pair)   # (C,R,R,F)
            head_out.append(jnp.sum(g * msg, axis=2))               # (C,R,F)
        out = jnp.mean(jnp.stack(head_out), axis=0)
        return out + fea


class Roost(nn.Module):
    """Composition GNN + weighted-attention crystal pooling
    (roost_message.py:159-264). Returns per-crystal features (C, fea_len)."""
    orig_elem_fea_len: int
    elem_fea_len: int
    n_graph: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, comp_weight, comp_fea, comp_mask):
        # comp_fea: (C, R, orig); comp_weight: (C, R); comp_mask: (C, R)
        fea = TorchLinear(self.elem_fea_len - 1, dtype=self.dtype,
                          name="embedding")(comp_fea)
        # concat fractional weight as the last feature (roost_message.py:245)
        fea = jnp.concatenate([fea, comp_weight[..., None].astype(fea.dtype)],
                              axis=-1)
        for i in range(self.n_graph):
            fea = MessageLayer(self.elem_fea_len, dtype=self.dtype,
                               name=f"graph_{i}")(comp_weight, fea, comp_mask)

        # crystal pooling: WeightedAttention with Identity message over the
        # elements of each crystal (roost_message.py:202-207, mat_heads = 1)
        gate = SimpleNetwork(1, [256], dtype=self.dtype,
                             name="cry_pool0_gate_nn")(fea)          # (C,R,1)
        pow_ = self.param("cry_pool0_pow", _randn_init, (1,))
        g = weighted_attention_dense(gate, comp_weight[..., None], pow_,
                                     comp_mask[..., None], axis=1)
        return jnp.sum(g * fea, axis=1)                              # (C,F)
