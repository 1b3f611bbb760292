"""Core NN building blocks (flax.linen).

TPU-native re-implementations of the reference's L1 layer
(reference: CGAT/message_changed.py:31-138, CGAT/CGAT.py:65-112):

* :class:`SimpleNetwork` — LeakyReLU MLP.
* :class:`ResidualNetwork` — ReLU residual MLP with optional ReZero gates and
  ``last_layer=False`` penultimate-feature output.
* :class:`MultiHeadNetwork` — H parallel 2-layer MLPs. The reference realises
  this as a cuDNN grouped 1x1 Conv1d with the input replicated per head
  (CGAT/CGAT.py:91-109); here it is a single batched einsum over an
  ``(H, out, in)`` weight tensor, which maps straight onto the MXU — an
  intentional redesign with identical numerics.

Parameter initialisation matches torch defaults so training dynamics match:
``nn.Linear``/``nn.Conv1d`` default to U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for
both weight and bias (kaiming_uniform(a=sqrt(5)) collapses to that bound).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

LEAKY_SLOPE = 0.01  # torch nn.LeakyReLU default negative_slope


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """U(+-1/sqrt(fan_in)); shape is (in, out) per flax convention."""
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class TorchLinear(nn.Module):
    """nn.Dense with torch's default init (keeps optimisation dynamics close)."""
    features: int
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", torch_linear_kernel_init,
                            (fan_in, self.features))
        y = jnp.asarray(x, self.dtype) @ jnp.asarray(kernel, self.dtype)
        if self.use_bias:
            bias = self.param("bias", torch_linear_bias_init(fan_in),
                              (self.features,))
            y = y + jnp.asarray(bias, self.dtype)
        return y


class MatmulEmbed(nn.Module):
    """Drop-in ``nn.Embed`` (same param name/shape/init, so checkpoints and
    host_init line up) whose lookup backward runs as a one-hot MXU matmul
    (ops/gather.py ``embed_lookup``) instead of the serialized XLA
    scatter-add — ~60 us/step at flagship dims for the (25, 128)
    neighbor-shell table (reference analog: ``nbr_embedding``,
    CGAT/CGAT.py:364)."""
    num_embeddings: int
    features: int
    embedding_init: nn.initializers.Initializer = nn.initializers.normal(1.0)

    @nn.compact
    def __call__(self, ids):
        from ..ops.gather import embed_lookup
        table = self.param("embedding", self.embedding_init,
                           (self.num_embeddings, self.features))
        return embed_lookup(table, ids)


class SimpleNetwork(nn.Module):
    """LeakyReLU MLP (reference message_changed.py:31-66)."""
    output_dim: int
    hidden_layer_dims: Sequence[int]
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        for i, h in enumerate(self.hidden_layer_dims):
            x = TorchLinear(h, dtype=self.dtype, name=f"fc_{i}")(x)
            x = nn.leaky_relu(x, LEAKY_SLOPE)
        return TorchLinear(self.output_dim, dtype=self.dtype, name="fc_out")(x)


class Rezero(nn.Module):
    """alpha * x with alpha initialised to 0 (reference message_changed.py:69-78)."""

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.zeros, (1,))
        return alpha * x


class ResidualNetwork(nn.Module):
    """ReLU residual MLP with linear skips (reference message_changed.py:81-135).

    ``fea = act(fc(fea)) + res_fc(fea)`` per layer (ReZero gates the branch when
    ``if_rezero``); ``last_layer=False`` returns the penultimate features, used
    for graph-embedding export (reference CGAT.py:595, lightning_module.py:212).
    """
    output_dim: int
    hidden_layer_dims: Sequence[int]
    if_rezero: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, *, last_layer: bool = True):
        dims = [x.shape[-1], *self.hidden_layer_dims]
        for i in range(len(dims) - 1):
            branch = nn.relu(TorchLinear(dims[i + 1], dtype=self.dtype,
                                         name=f"fc_{i}")(x))
            if self.if_rezero:
                branch = Rezero(name=f"rezero_{i}")(branch)
            if dims[i] != dims[i + 1]:
                skip = TorchLinear(dims[i + 1], use_bias=False,
                                   dtype=self.dtype, name=f"res_fc_{i}")(x)
            else:
                skip = x
            x = branch + skip
        if last_layer:
            return TorchLinear(self.output_dim, dtype=self.dtype,
                               name="fc_out")(x)
        return x


def _mh_kernel_init(key, shape, dtype=jnp.float32):
    """(H, out, in) grouped-conv weight; torch Conv1d default U(+-1/sqrt(fan_in))
    with fan_in = in_channels_per_group * kernel_size = in."""
    fan_in = shape[2]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class MultiHeadNetwork(nn.Module):
    """H parallel [Linear -> LeakyReLU -> Linear] networks over a shared input.

    Replaces the reference's grouped Conv1d with input ``repeat``ed per head
    (CGAT/CGAT.py:91-109): ``y[b,h,o] = W2[h] @ leaky_relu(W1[h] @ x[b] + b1[h]) + b2[h]``.
    Input of any shape ``(B, ..., input_dim_total)`` is flattened to
    ``(B, input_dim)`` exactly like the reference's ``reshape(-1, input_dim, 1)``.
    Output: ``(B, nb_heads, output_dim)``.
    """
    input_dim: int
    output_dim: int
    hidden_layer_dim: int
    nb_heads: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x=None, *, split_parts=None, flat=False):
        """Either the plain path (``x`` of shape ``(B, ..., input_dim)``) or
        the split-projection path: ``split_parts`` is a list of
        ``(features, gather_idx_or_None)`` whose feature widths consume
        consecutive slices of ``input_dim``. For parts with a gather index,
        ``fc_in`` is applied to the (small) source table FIRST and the
        projections are gathered per row — mathematically identical to
        projecting the gathered concat (the first layer is linear), but a
        node's features are projected once instead of once per incident
        edge. Same parameters either way.

        ``flat=True`` requests the FUSED Pallas path: one kernel runs
        fc_in -> LeakyReLU -> grouped fc_out over row blocks entirely in
        2D layouts and returns ``(B, heads*output_dim)`` head-major — the
        layout the fused attention kernels consume, so the (B, H, hid)/
        (B, H, F) relayouts disappear (ops/pallas/mh_network.py). Same
        parameters; falls back to the einsum path (3D output) when the
        dims/dtype aren't kernel-eligible — check the returned rank."""
        w_in = self.param("fc_in_kernel", _mh_kernel_init,
                          (self.nb_heads, self.hidden_layer_dim, self.input_dim))
        b_in = self.param("fc_in_bias", torch_linear_bias_init(self.input_dim),
                          (self.nb_heads, self.hidden_layer_dim))
        w_out = self.param("fc_out_kernel", _mh_kernel_init,
                           (self.nb_heads, self.output_dim, self.hidden_layer_dim))
        b_out = self.param("fc_out_bias",
                           torch_linear_bias_init(self.hidden_layer_dim),
                           (self.nb_heads, self.output_dim))
        if flat and split_parts is None:
            from ..ops.pallas.mh_network import (
                _block_rows, mh_network, supported)
            dt = self.dtype or jnp.float32
            x2 = jnp.asarray(x.reshape(-1, self.input_dim), dt)
            if (supported(self.input_dim, self.hidden_layer_dim,
                          self.output_dim, self.nb_heads, dt)
                    and _block_rows(x2.shape[0]) is not None):
                # weight re-layouts are parameter-sized (KBs) — negligible
                # next to the (B, ...) activation relayouts they remove
                win = jnp.asarray(w_in, dt).transpose(2, 0, 1).reshape(
                    self.input_dim, -1)
                wout = jnp.asarray(w_out, dt).transpose(0, 2, 1).reshape(
                    -1, self.output_dim)
                return mh_network(
                    x2, win, jnp.asarray(b_in, dt).reshape(-1),
                    wout, jnp.asarray(b_out, dt).reshape(-1),
                    heads=self.nb_heads, hid=self.hidden_layer_dim,
                    f=self.output_dim)
            # not eligible: einsum path below returns (B, H, F) — callers
            # of flat=True branch on the returned rank
        wi = jnp.asarray(w_in, self.dtype)
        if split_parts is None:
            x = jnp.asarray(x.reshape(-1, self.input_dim), self.dtype)
            h = jnp.einsum("bi,hji->bhj", x, wi)
        else:
            h, off = 0.0, 0
            for feat, idx in split_parts:
                d = feat.shape[-1]
                p = jnp.einsum("bi,hji->bhj", jnp.asarray(feat, self.dtype),
                               wi[:, :, off:off + d])
                h = h + (p if idx is None else p[idx])
                off += d
            assert off == self.input_dim, (off, self.input_dim)
        h = nn.leaky_relu(h + jnp.asarray(b_in, self.dtype), LEAKY_SLOPE)
        y = jnp.einsum("bhj,hoj->bho", h, jnp.asarray(w_out, self.dtype))
        return y + jnp.asarray(b_out, self.dtype)
