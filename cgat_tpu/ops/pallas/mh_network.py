"""Fused Pallas TPU kernel: the per-edge MultiHead gate/message network.

The reference realises MultiHeadNetwork as a cuDNN grouped Conv1d over the
input replicated per head (reference CGAT/CGAT.py:91-109). The XLA einsum
redesign (models/blocks.py) is numerically identical but materialises two
3D intermediates per call — (E, H, hidden) after fc_in and (E, H, F) after
fc_out — whose TPU tilings differ from the producing matmuls' 2D outputs
AND from the (E, H*F) flat view the fused attention kernel consumes:
measured 0.22 ms/step of (8448, 640) reshapes + 0.14 ms of (8448, 5, 256)
relayouts at flagship dims (round-4 step trace).

This kernel runs the whole head-parallel MLP in one pass over edge blocks,
entirely in 2D layouts:

    p   = x @ Win + b_in            # (BE, H*hid), Win pre-flattened
    h   = leaky_relu(p, 0.01)
    out[:, h*F:(h+1)*F] = h[:, h*hid:(h+1)*hid] @ Wout_h + b_out_h

The grouped fc_out is H static-sliced (hid, F) matmuls — block-diagonal
without the H x FLOP inflation of a dense (H*hid, H*F) form. Weights stay
VMEM-resident across the grid (~1.3 MB at flagship dims). Output is
(E, H*F) flat — exactly the attention kernel's input layout, so the
3D round trips disappear in both directions.

Backward (custom VJP, same no-3D property): saves the flat h; the
activation mask is recovered from sign(h) (leaky_relu preserves sign).
dW/db accumulate in VMEM f32 scratch across the sequential grid and are
written at the last step. Gated to bf16 with lane-multiple dims; anything
else falls back to the einsum path in models/blocks.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LEAKY_SLOPE = 0.01

# module-level interpret default (tests set True off-TPU)
INTERPRET = False

MAX_BLOCK = 768      # fwd edge rows per grid step
MAX_BLOCK_BWD = 384  # bwd runs ~3x the live block-sized f32 temporaries


def supported(cat: int, hid: int, out: int, heads: int, dtype) -> bool:
    return (dtype == jnp.bfloat16 and cat % 128 == 0 and out % 128 == 0
            and (heads * hid) % 128 == 0 and hid % 8 == 0)


def _block_rows(e_tot: int, max_block: int = MAX_BLOCK) -> int | None:
    """Largest 16-multiple divisor of ``e_tot`` in [128, max_block] (block
    shapes must divide the array — no padding copies)."""
    for be in range(min(max_block, e_tot), 127, -16):
        if e_tot % be == 0:
            return be
    return None


def _fwd_kernel(x_ref, win_ref, bin_ref, wout_ref, bout_ref, out_ref,
                *maybe_h_ref, heads, hid, f):
    """Forward kernel; with a trailing ``h_ref`` output it also saves the
    flat post-activation for the VJP. The primal (inference/serving) path
    runs WITHOUT it — the (E, H*hid) write only exists to serve the
    backward, and XLA cannot DCE a pallas output (~10 x 21.6 MB per
    flagship forward; r4 advisor finding)."""
    xv = x_ref[...]
    p = jax.lax.dot_general(xv, win_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = p + bin_ref[...].astype(jnp.float32)
    h = jnp.where(p > 0, p, LEAKY_SLOPE * p).astype(xv.dtype)  # (BE, H*hid)
    if maybe_h_ref:
        maybe_h_ref[0][...] = h
    parts = []
    for k in range(heads):
        o = jax.lax.dot_general(
            h[:, k * hid:(k + 1) * hid], wout_ref[k * hid:(k + 1) * hid, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (BE, F)
        parts.append(o + bout_ref[:, k * f:(k + 1) * f].astype(jnp.float32))
    out_ref[...] = jnp.concatenate(parts, axis=1).astype(out_ref.dtype)


def _bwd_kernel(x_ref, h_ref, g_ref, win_ref, wout_ref, dx_ref,
                dwin_ref, dbin_ref, dwout_ref, dbout_ref,
                *, heads, hid, f):
    j = pl.program_id(0)

    @pl.when(j == 0)
    def _():
        dwin_ref[...] = jnp.zeros_like(dwin_ref)
        dbin_ref[...] = jnp.zeros_like(dbin_ref)
        dwout_ref[...] = jnp.zeros_like(dwout_ref)
        dbout_ref[...] = jnp.zeros_like(dbout_ref)

    hv = h_ref[...]
    gv = g_ref[...]
    # dh per head: dy_h @ Wout_h^T, assembled flat
    dh = jnp.concatenate(
        [jax.lax.dot_general(
            gv[:, k * f:(k + 1) * f], wout_ref[k * hid:(k + 1) * hid, :],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
         for k in range(heads)], axis=1)                       # (BE, H*hid)
    # leaky_relu mask from the saved post-activation sign (slope > 0
    # preserves sign, so h > 0 <=> pre-activation > 0; h == 0 has zero
    # upstream either way at slope 0.01 except exact-zero pre, measure
    # zero). Compare in f32: v5e Mosaic has no bf16 vector cmpf.
    dpre = jnp.where(hv.astype(jnp.float32) > 0, dh, LEAKY_SLOPE * dh)
    dpre_b = dpre.astype(hv.dtype)
    dx_ref[...] = jax.lax.dot_general(
        dpre_b, win_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dx_ref.dtype)

    xv = x_ref[...]
    dwin_ref[...] += jax.lax.dot_general(
        xv, dpre_b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                    # (cat, H*hid)
    dbin_ref[...] += jnp.sum(dpre, axis=0, keepdims=True)
    for k in range(heads):
        dwout_ref[k * hid:(k + 1) * hid, :] += jax.lax.dot_general(
            hv[:, k * hid:(k + 1) * hid], gv[:, k * f:(k + 1) * f],
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # (hid, F)
    dbout_ref[...] += jnp.sum(gv.astype(jnp.float32), axis=0, keepdims=True)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def _mh_fused(x, win, bin_, wout, bout, dims, interpret):
    # primal path (inference/serving/export): no saved-activation output
    out, _ = _fwd_impl(x, win, bin_, wout, bout, dims, interpret,
                       emit_h=False)
    return out


def _fwd_impl(x, win, bin_, wout, bout, dims, interpret, emit_h=True):
    heads, hid, f = dims
    e_tot, cat = x.shape
    be = _block_rows(e_tot)
    assert be is not None, "caller gates on _block_rows"
    grid = (e_tot // be,)
    out_specs = [pl.BlockSpec((be, heads * f), lambda j: (j, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((e_tot, heads * f), x.dtype)]
    if emit_h:
        out_specs.append(pl.BlockSpec((be, heads * hid), lambda j: (j, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((e_tot, heads * hid), x.dtype))
    res = pl.pallas_call(
        functools.partial(_fwd_kernel, heads=heads, hid=hid, f=f),
        grid=grid,
        in_specs=[
            pl.BlockSpec((be, cat), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),      # x
            pl.BlockSpec(memory_space=pltpu.VMEM),      # Win (cat, H*hid)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # b_in (1, H*hid)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # Wout (H*hid, F)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # b_out (1, H*F)
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        name="mh_net_fwd",
    )(x, win, bin_.reshape(1, -1), wout, bout.reshape(1, -1))
    return (res[0], res[1]) if emit_h else (res[0], None)


def _vjp_fwd(x, win, bin_, wout, bout, dims, interpret):
    out, h = _fwd_impl(x, win, bin_, wout, bout, dims, interpret)
    return out, (x, h, win, wout)


def _xla_bwd(x, h, g, win, wout, heads, hid, f):
    """Plain-XLA backward (same math as _bwd_kernel) for edge counts whose
    only block divisor fits the forward's MAX_BLOCK but not MAX_BLOCK_BWD
    (e.g. E = 928 = 2*464: fwd runs at be=464, but no 16-multiple divisor
    lies in [128, 384]). Keeps those batch shapes trainable instead of
    crashing at grad-trace time."""
    e_tot = x.shape[0]
    g3 = g.astype(jnp.float32).reshape(e_tot, heads, f)
    h3 = h.astype(jnp.float32).reshape(e_tot, heads, hid)
    w3 = wout.astype(jnp.float32).reshape(heads, hid, f)
    dh = jnp.einsum("ehf,hjf->ehj", g3, w3).reshape(e_tot, heads * hid)
    dpre = jnp.where(h.astype(jnp.float32) > 0, dh, LEAKY_SLOPE * dh)
    dpre_b = dpre.astype(x.dtype)
    dx = (dpre_b @ win.T).astype(x.dtype)
    dwin = jnp.einsum("ec,ew->cw", x.astype(jnp.float32), dpre)
    dbin = jnp.sum(dpre, axis=0)
    dwout = jnp.einsum("ehj,ehf->hjf", h3, g3).reshape(heads * hid, f)
    dbout = jnp.sum(g3, axis=0).reshape(heads * f)
    return (dx, dwin.astype(win.dtype), dbin.astype(win.dtype),
            dwout.astype(wout.dtype), dbout.astype(wout.dtype))


def _vjp_bwd(dims, interpret, res, g):
    heads, hid, f = dims
    x, h, win, wout = res
    e_tot, cat = x.shape
    be = _block_rows(e_tot, MAX_BLOCK_BWD)
    if be is None:
        return _xla_bwd(x, h, g, win, wout, heads, hid, f)
    grid = (e_tot // be,)
    acc = lambda j, *_: (0, 0)
    dx, dwin, dbin, dwout, dbout = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=heads, hid=hid, f=f),
        grid=grid,
        in_specs=[
            pl.BlockSpec((be, cat), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),      # x
            pl.BlockSpec((be, heads * hid), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),      # h
            pl.BlockSpec((be, heads * f), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),      # g
            pl.BlockSpec(memory_space=pltpu.VMEM),      # Win
            pl.BlockSpec(memory_space=pltpu.VMEM),      # Wout
        ],
        out_specs=[
            pl.BlockSpec((be, cat), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),      # dx (blocked)
            pl.BlockSpec((cat, heads * hid), acc,
                         memory_space=pltpu.VMEM),      # dWin (accumulated)
            pl.BlockSpec((1, heads * hid), acc,
                         memory_space=pltpu.VMEM),      # db_in
            pl.BlockSpec((heads * hid, f), acc,
                         memory_space=pltpu.VMEM),      # dWout
            pl.BlockSpec((1, heads * f), acc,
                         memory_space=pltpu.VMEM),      # db_out
        ],
        out_shape=[
            jax.ShapeDtypeStruct((e_tot, cat), x.dtype),
            jax.ShapeDtypeStruct((cat, heads * hid), jnp.float32),
            jax.ShapeDtypeStruct((1, heads * hid), jnp.float32),
            jax.ShapeDtypeStruct((heads * hid, f), jnp.float32),
            jax.ShapeDtypeStruct((1, heads * f), jnp.float32),
        ],
        interpret=interpret,
        name="mh_net_bwd",
    )(x, h, g, win, wout)
    # cotangent dtypes must match the primals (the f32 master params get
    # their grads through the upstream convert's VJP, like the einsum path)
    return (dx, dwin.astype(win.dtype), dbin[0].astype(win.dtype),
            dwout.astype(wout.dtype), dbout[0].astype(wout.dtype))


_mh_fused.defvjp(_vjp_fwd, _vjp_bwd)


def mh_network(x, win, b_in, wout, b_out, *, heads: int, hid: int, f: int,
               interpret: bool | None = None):
    """Fused head-parallel [Linear -> LeakyReLU -> Linear] over a shared
    input (the MultiHeadNetwork hot path).

    x:     (E, cat) bf16
    win:   (cat, H*hid) — per-head fc_in kernels concatenated on the output
           axis (head-major: columns [k*hid, (k+1)*hid) belong to head k)
    b_in:  (H*hid,)
    wout:  (H*hid, F) — per-head fc_out kernels stacked on the ROW axis
           (rows [k*hid, (k+1)*hid) belong to head k)
    b_out: (H*F,)
    Returns (E, H*F) flat, head-major — the attention kernels' layout.
    """
    if interpret is None:
        from .config import interpret_default
        interpret = INTERPRET or interpret_default()
    return _mh_fused(x, win, b_in, wout, b_out, (heads, hid, f), interpret)
