"""Hypernetwork stack: per-sample predicted MLPs (flax.linen).

Re-implementation of the reference's hypernetwork message/update functions
(reference: CGAT/Hypernetworksmp.py:24-313). A conditioning vector per node /
edge drives an ``FCBlock`` (Tanh MLP) that predicts the weights and biases of
a small MLP, which is then applied to that sample's own input — a natural fit
for batched einsum on the MXU instead of per-sample ``matmul`` loops.

Structure (defaults used by the CGAT model, CGAT/CGAT.py:300-305):
``HyperFC`` = 3x [predicted Linear -> LayerNorm(no affine) -> Tanh] followed by
one predicted Linear (``outermost_linear=True`` hard-coded in H_Net/H_Net_0,
Hypernetworksmp.py:267-274).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import torch_linear_bias_init


def _kaiming_normal_init(key, shape, dtype=jnp.float32):
    """kaiming_normal(fan_in, leaky_relu a=0) on an (in, out) kernel."""
    fan_in = shape[0]
    std = jnp.sqrt(2.0 / fan_in)
    return jax.random.normal(key, shape, dtype) * std


def _kaiming_normal_scaled_init(key, shape, dtype=jnp.float32):
    """Last hyper layer: kaiming_normal * 0.1 (Hypernetworksmp.py:212-219)."""
    return _kaiming_normal_init(key, shape, dtype) * 0.1


class FCBlock(nn.Module):
    """Tanh MLP predicting hyper parameters (Hypernetworksmp.py:36-83).

    [Linear->Tanh] x (1 + num_hidden_layers) then a final plain Linear
    (``outermost_linear=True`` path, the only one used). The final Linear uses
    the down-scaled init when ``scaled_last`` (HyperLinear's hypo_params).
    """
    hidden_ch: int
    num_hidden_layers: int
    out_features: int
    scaled_last: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, apply_last=None):
        """``apply_last``: optional ``f(hidden, kernel, bias)`` replacing the
        plain last Linear — lets HyperLinear fuse the prediction with the
        per-sample apply (ops/pallas/hyper_apply.py) without moving the
        parameters out of this module's tree."""
        for i in range(1 + self.num_hidden_layers):
            fan_in = x.shape[-1]
            k = self.param(f"fc_{i}_kernel", _kaiming_normal_init,
                           (fan_in, self.hidden_ch))
            b = self.param(f"fc_{i}_bias", torch_linear_bias_init(fan_in),
                           (self.hidden_ch,))
            x = jnp.tanh(jnp.asarray(x, self.dtype) @ jnp.asarray(k, self.dtype)
                         + jnp.asarray(b, self.dtype))
        fan_in = x.shape[-1]
        init = _kaiming_normal_scaled_init if self.scaled_last else _kaiming_normal_init
        k = self.param("fc_last_kernel", init, (fan_in, self.out_features))
        b = self.param("fc_last_bias", torch_linear_bias_init(fan_in),
                       (self.out_features,))
        if apply_last is not None:
            return apply_last(jnp.asarray(x, self.dtype),
                              jnp.asarray(k, self.dtype),
                              jnp.asarray(b, self.dtype))
        return jnp.asarray(x, self.dtype) @ jnp.asarray(k, self.dtype) + jnp.asarray(b, self.dtype)


class HyperLinear(nn.Module):
    """Predicts a per-sample Linear(in_ch -> out_ch) and applies it.

    ``__call__(cond, x)``: predict ``(B, out, in)`` weights + ``(B, out)``
    biases from ``cond`` (Hypernetworksmp.py:222-254) and return
    ``x @ W^T + b`` (BatchLinear, Hypernetworksmp.py:205-209) as one einsum.
    """
    in_ch: int
    out_ch: int
    hyper_num_hidden_layers: int
    hyper_hidden_ch: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, cond, x):
        fcb = FCBlock(self.hyper_hidden_ch, self.hyper_num_hidden_layers,
                      self.in_ch * self.out_ch + self.out_ch,
                      scaled_last=True, dtype=self.dtype,
                      name="hypo_params")
        # Fused path: the (B, out, in) view of the FCBlock's flat output
        # forces XLA to re-tile every predicted weight tensor (~25 MB/call,
        # 755 MB/step at flagship dims of copy-done; equivalent mul+reduce
        # or explicit-VJP formulations canonicalise to the identical HLO —
        # docs/PERFORMANCE.md round 3b). The fused Pallas kernel predicts
        # the last hyper Linear and applies the per-sample weights in VMEM,
        # so the tensor is never materialised in HBM (forward; the
        # backward keeps the XLA forms for now).
        from ..ops import attention as _att
        from ..ops.pallas.hyper_apply import hyper_apply, supported
        dt = self.dtype or jnp.float32
        if (_att.get_backend() == "pallas"
                and supported(self.hyper_hidden_ch, self.in_ch,
                              self.out_ch, dt)):
            return fcb(cond, apply_last=lambda h, k, b: hyper_apply(
                h, k, b, jnp.asarray(x, dt), out_ch=self.out_ch))
        params = fcb(cond)
        w = params[..., : self.in_ch * self.out_ch]
        b = params[..., self.in_ch * self.out_ch:]
        w = w.reshape(-1, self.out_ch, self.in_ch)
        return jnp.einsum("boi,bi->bo", w, jnp.asarray(x, self.dtype)) + b


class HyperFC(nn.Module):
    """Predicted MLP: chained HyperLayers + final HyperLinear.

    Mirrors HyperFC(..., outermost_linear=True) (Hypernetworksmp.py:117-185):
    ``num_hidden_layers + 1`` [HyperLinear -> LayerNorm(no affine) -> Tanh]
    blocks, then one bare HyperLinear. All layers share the conditioning input.
    """
    hyper_num_hidden_layers: int
    hyper_hidden_ch: int
    hidden_ch: int
    num_hidden_layers: int
    in_ch: int
    out_ch: int
    dtype: jnp.dtype | None = None
    remat: bool = False

    @nn.compact
    def __call__(self, cond, x):
        # selective remat: each HyperLinear's (B, out*in+out) predicted-param
        # tensor dominates activation memory (N x 16.5k floats per call at
        # flagship dims); rematerialising just these blocks trades ~2x the
        # hyper matmuls in backward for not spilling those tensors to HBM
        cls = nn.remat(HyperLinear) if self.remat else HyperLinear
        dims_in = [self.in_ch] + [self.hidden_ch] * self.num_hidden_layers
        for i, d_in in enumerate(dims_in):
            x = cls(d_in, self.hidden_ch,
                    self.hyper_num_hidden_layers, self.hyper_hidden_ch,
                    dtype=self.dtype, name=f"layer_{i}")(cond, x)
            x = nn.LayerNorm(use_bias=False, use_scale=False,
                             epsilon=1e-5)(x)
            x = jnp.tanh(x)
        return cls(self.hidden_ch, self.out_ch,
                   self.hyper_num_hidden_layers, self.hyper_hidden_ch,
                   dtype=self.dtype, name="layer_last")(cond, x)


class HNet0(nn.Module):
    """H_Net_0: hyper-MLP conditioned on ``h_0`` applied to ``x``
    (Hypernetworksmp.py:257-285). Used by the first message-passing layer."""
    hyper_in_ch: int
    hyper_num_hidden_layers: int
    hyper_hidden_ch: int
    hidden_ch: int
    num_hidden_layers: int
    in_ch: int
    out_ch: int
    dtype: jnp.dtype | None = None
    remat: bool = False

    @nn.compact
    def __call__(self, h_0, x):
        return HyperFC(self.hyper_num_hidden_layers, self.hyper_hidden_ch,
                       self.hidden_ch, self.num_hidden_layers,
                       self.in_ch, self.out_ch, dtype=self.dtype,
                       remat=self.remat, name="Hyper")(h_0, x)


class HNet(nn.Module):
    """H_Net: conditioning = damping * h_0 + (1 - damping) * x, with damping a
    learnable scalar projected into [0, 1] (Hypernetworksmp.py:288-313).

    The reference clamps ``damping.data`` in-place each forward (projected
    gradient); here a straight-through clip reproduces that: value clamped,
    gradient unit. Note the reference conditions on ``x`` (the aggregated
    message), not ``h_t`` — ``h_t`` is unused (Hypernetworksmp.py:309-313).
    """
    hyper_in_ch: int
    hyper_num_hidden_layers: int
    hyper_hidden_ch: int
    hidden_ch: int
    num_hidden_layers: int
    in_ch: int
    out_ch: int
    dtype: jnp.dtype | None = None
    remat: bool = False

    @nn.compact
    def __call__(self, h_0, h_t, x):
        damping = self.param("damping", nn.initializers.uniform(scale=1.0), (1,))
        d = damping + jax.lax.stop_gradient(jnp.clip(damping, 0.0, 1.0) - damping)
        cond = d * h_0 + (1.0 - d) * x
        return HyperFC(self.hyper_num_hidden_layers, self.hyper_hidden_ch,
                       self.hidden_ch, self.num_hidden_layers,
                       self.in_ch, self.out_ch, dtype=self.dtype,
                       remat=self.remat, name="Hyper")(cond, x)
