"""Fused hypernetwork predict+apply Pallas TPU kernel.

The CGAT hypernetworks (models/hyper.py, reference
CGAT/Hypernetworksmp.py:205-254) predict a per-node weight matrix
``W[b] = (FCBlock_last(hidden[b])).reshape(out, in)`` and apply it to that
node's own input: ``out[b] = W[b] @ x[b] + beta[b]``. Under XLA this
materialises a (B, out, in) tensor whose tiled layout differs from the
producing matmul's 2D output — measured 755 MB/step of pure layout copies
at flagship dims, irreducible at the source level (mul+reduce, transposed
parametrisations and explicit 2D VJPs all canonicalise to the same HLO;
docs/PERFORMANCE.md round 3b).

This kernel fuses the last hyper Linear with the per-sample apply so the
predicted weights never leave VMEM:

    P = hidden_blk @ K + c            # (BB, F), F = O*I + O, MXU
    xt[:, o*I + i] = x[:, i]          # x tiled O times along lanes
    out = (P[:, :O*I] * xt) @ S + P[:, O*I:]
                                      # S[f, o] = 1 if f // I == o

The block-diagonal one-hot contraction sums each 128-lane group on the
MXU (same trick as the segment-attention scatter). HBM traffic per call
drops from ~55 MB (P round-trip + relayout copies) to ~6 MB (K resident
in VMEM + the small blocks).

The backward is fused too (``FUSED_BWD``): a dh/dx kernel (recomputes the
predicted chunks from the VMEM-resident K; the cotangent is replicated
across each o's I lanes by static lane-broadcasts, and dx accumulates
per-group I-lane slices — no replication matmuls) and an F-chunked dK/db
kernel with the batch loop inside so each weight chunk is written exactly
once. Gated to bf16 with I, O, C multiples of 128 (the flagship is
128/128/128); anything else falls back to the XLA path in models/hyper.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# module-level interpret default (tests force True off-TPU, like
# segment_attention.INTERPRET)
INTERPRET = False

BLOCK_ROWS = 128  # rows per grid step: full MXU row occupancy. 32 (the
# round-3 value, sized when P was processed full-width) left 3/4 of the
# systolic rows idle in every matmul; with F-chunking the (BB, width)
# working set fits VMEM at 128 rows (A/B on v5e round 4, together with the
# one-hot rework below: grad path 130 -> 47 us/call, fwd 47 -> 43)

# use the fused Pallas backward (dh/dx kernel + F-chunked dK kernel)
# instead of the XLA einsum VJP
FUSED_BWD = True


def supported(hidden_dim: int, in_ch: int, out_ch: int, dtype) -> bool:
    return (dtype == jnp.bfloat16 and hidden_dim % 128 == 0
            and in_ch % 128 == 0 and out_ch % 128 == 0)


GROUP_O = 32  # predicted-output rows per F-chunk (chunk width = GROUP_O * I)
GROUP_O_BWD = 16  # dhdx's F-chunk: runs more live (BB, width) temporaries
# than the forward (gt, p_c, dp_c); 16 leaves VMEM headroom and measured
# equal to 32 (47.0 vs 47.7 us/call, v5e round 4)


def _mm(a, b, dims, interp):
    """bf16 x bf16 -> f32 dot. In interpret mode the operands are upcast to
    f32 first: numerically IDENTICAL (bf16 values are exact in f32 and the
    MXU accumulates f32 anyway), but avoids XLA:CPU's DotThunk gap on some
    fused bf16 x bf16 = f32 forms ("Unsupported element type",
    shape-dependent — surfaced at B=128, fine at B=768; round 4)."""
    if interp and a.dtype == jnp.bfloat16:
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
    return jax.lax.dot_general(a, b, dims,
                               preferred_element_type=jnp.float32)


def _fwd_kernel(h_ref, x_ref, k_ref, c_ref, out_ref, xt_s, s_s,
                *, bb, ci, oi, f, interp):
    j = pl.program_id(0)
    O = oi
    I = (f - O) // O
    W = O * I
    G = GROUP_O
    width = G * I

    @pl.when(j == 0)
    def _():
        # chunk-local one-hot S[r, q] = (r // I == q), (width, G) — the
        # SAME for every chunk (chunk c's outputs are columns c*G..): built
        # once instead of a (width, O) iota/where per chunk (round-4 A/B:
        # the per-chunk builds were ~20% of the kernel)
        rows = jax.lax.broadcasted_iota(jnp.int32, (width, G), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (width, G), 1)
        s_s[...] = jnp.where(rows // I == cols, 1.0, 0.0).astype(s_s.dtype)

    # x tiled G times along lanes: xt[:, g*I + i] = x[:, i] — identical for
    # every F-chunk of this row block, built once per block
    xv = x_ref[...]
    for g in range(G):
        xt_s[:, g * I:(g + 1) * I] = xv

    hv = h_ref[...]
    parts = []
    # the (BB, F) predicted tensor is processed in F-chunks so the kernel's
    # scoped VMEM stays small (a full-width P at flagship dims blew the
    # 16 MB budget); K stays resident whole, chunks are static lane slices
    for c in range(O // G):
        # predicted chunk, f32 accumulation then the XLA path's bf16 round
        p_c = _mm(hv, k_ref[:, c * width:(c + 1) * width],
                  (((1,), (0,)), ((), ())), interp)
        p_c = (p_c + c_ref[:, c * width:(c + 1) * width]
               .astype(jnp.float32)).astype(hv.dtype)          # (BB, width)
        q_c = p_c * xt_s[...]
        parts.append(_mm(q_c, s_s[...], (((1,), (0,)), ((), ())),
                         interp))                              # (BB, G)
    acc = jnp.concatenate(parts, axis=1)                       # (BB, O)

    # predicted bias tail: columns [W, W + O)
    p_b = _mm(hv, k_ref[:, W:], (((1,), (0,)), ((), ())), interp)
    p_b = (p_b + c_ref[:, W:].astype(jnp.float32)).astype(hv.dtype)
    out_ref[...] = (acc + p_b.astype(jnp.float32)).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _hyper_apply(hidden, kernel, bias, x, out_ch, interpret):
    return _fwd_impl(hidden, kernel, bias, x, out_ch, interpret)


def _fwd_impl(hidden, kernel, bias, x, out_ch, interpret):
    b_tot, ci = hidden.shape
    f = kernel.shape[1]
    oi = out_ch
    bb = BLOCK_ROWS
    pad = (-b_tot) % bb
    if pad:
        hidden = jnp.pad(hidden, ((0, pad), (0, 0)))
        x = jnp.pad(x, ((0, pad), (0, 0)))
    nblocks = (b_tot + pad) // bb
    w = f - oi

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, bb=bb, ci=ci, oi=oi, f=f,
                          interp=interpret),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((bb, ci), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),      # hidden
            pl.BlockSpec((bb, w // oi), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),      # x
            pl.BlockSpec(memory_space=pltpu.VMEM),      # kernel (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # bias (1, F)
        ],
        out_specs=pl.BlockSpec((bb, oi), lambda j: (j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_tot + pad, oi), hidden.dtype),
        scratch_shapes=[
            pltpu.VMEM((bb, GROUP_O * (w // oi)), hidden.dtype),  # xt chunk
            pltpu.VMEM((GROUP_O * (w // oi), GROUP_O), hidden.dtype),  # S
        ],
        interpret=interpret,
        name="hyper_apply_fwd",
    )(hidden, x, kernel, bias.reshape(1, f))
    return out[:b_tot]


def _g_tiled(gv, c, G, I):
    """Gt[b, g*I + i] = g[b, c*G + g]: each of the chunk's G cotangent
    columns broadcast across its I lanes. Lane-broadcasts of static 1-lane
    slices — no iota/where build and no (BB, O) @ (O, width) replication
    matmul (round-4 rework: those were ~half the dhdx kernel's MXU work)."""
    bb = gv.shape[0]
    return jnp.concatenate(
        [jnp.broadcast_to(gv[:, c * G + q:c * G + q + 1], (bb, I))
         for q in range(G)], axis=1)                           # (BB, G*I)


def _bwd_dhdx_kernel(h_ref, x_ref, g_ref, k_ref, c_ref, dh_ref, dx_ref,
                     xt_s, *, bb, ci, oi, f, interp):
    """dh = dP @ K^T and dx = sum_o g_o * P_o per row block, F-chunked.
    dP = [Gt * Xt | g] where Gt replicates g across each o's I lanes."""
    O = oi
    I = (f - O) // O
    W = O * I
    G = GROUP_O_BWD
    width = G * I

    xv = x_ref[...]
    for g_i in range(G):
        xt_s[:, g_i * I:(g_i + 1) * I] = xv

    hv = h_ref[...]
    gv = g_ref[...]
    dh = jnp.zeros((bb, ci), jnp.float32)
    dx = jnp.zeros((bb, I), jnp.float32)
    for c in range(O // G):
        gt = _g_tiled(gv, c, G, I)                             # (BB, width)
        kc = k_ref[:, c * width:(c + 1) * width]
        p_c = _mm(hv, kc, (((1,), (0,)), ((), ())), interp)
        p_c = (p_c + c_ref[:, c * width:(c + 1) * width]
               .astype(jnp.float32)).astype(hv.dtype)
        dp_c = gt * xt_s[...]
        dh = dh + _mm(dp_c, kc, (((1,), (1,)), ((), ())), interp)
        # dx += sum over the chunk's G output groups of g_o * P_o — static
        # I-lane slices accumulated in f32 (replaces the (BB, width) @
        # (width, I) one-hot contraction; bf16 products, f32 adds, same
        # rounding as the matmul it replaces)
        t = gt * p_c
        for q in range(G):
            dx = dx + t[:, q * I:(q + 1) * I].astype(jnp.float32)
    # predicted-bias tail: dP[:, W:] = g
    dh = dh + _mm(gv, k_ref[:, W:], (((1,), (1,)), ((), ())), interp)
    dh_ref[...] = dh.astype(dh_ref.dtype)
    dx_ref[...] = dx.astype(dx_ref.dtype)


def _bwd_dk_kernel(ht_ref, x_ref, g_ref, dk_ref, db_ref, xt_s,
                   *, b_pad, ci, oi, f, interp):
    """dK_w (C, W) = sum_b h[b]^T dP_w[b] and db_w, F-chunked with the
    batch loop inside so each weight chunk is written exactly once.

    Single grid step with STATIC chunk indices, so the cotangent
    replication uses the _g_tiled lane-broadcast form — the former grid
    over chunks forced a per-batch (BR, O) @ (O, width) one-hot matmul
    that doubled the kernel's MXU work (round-4 rework)."""
    O = oi
    I = (f - O) // O
    G = GROUP_O_BWD   # 16: the whole (C, W) output lives in VMEM now, so
    # the chunk working set must stay small (32 overflowed by 0.4 MB)
    width = G * I
    BR = 128

    for c in range(O // G):
        acc = jnp.zeros((ci, width), jnp.float32)
        dbacc = jnp.zeros((1, width), jnp.float32)
        for bb in range(b_pad // BR):
            gv = g_ref[bb * BR:(bb + 1) * BR, :]               # (BR, O)
            xv = x_ref[bb * BR:(bb + 1) * BR, :]
            for g_i in range(G):
                xt_s[:, g_i * I:(g_i + 1) * I] = xv
            gt = _g_tiled(gv, c, G, I)                         # (BR, width)
            dp = gt * xt_s[...]
            acc = acc + _mm(ht_ref[:, bb * BR:(bb + 1) * BR], dp,
                            (((1,), (0,)), ((), ())), interp)
            dbacc = dbacc + jnp.sum(dp.astype(jnp.float32), axis=0,
                                    keepdims=True)
        dk_ref[:, c * width:(c + 1) * width] = acc.astype(dk_ref.dtype)
        db_ref[:, c * width:(c + 1) * width] = dbacc.astype(db_ref.dtype)


def _fused_bwd(hidden, kernel, bias, x, g, out_ch, interpret):
    b_tot, ci = hidden.shape
    f = kernel.shape[1]
    oi = out_ch
    ii = x.shape[1]
    w = oi * ii
    width_b = GROUP_O_BWD * ii    # dhdx and dK kernels' F-chunk
    bb = BLOCK_ROWS
    pad = (-b_tot) % 128  # dK kernel iterates 128-row batches
    if pad:
        hidden = jnp.pad(hidden, ((0, pad), (0, 0)))
        x = jnp.pad(x, ((0, pad), (0, 0)))
        g = jnp.pad(g, ((0, pad), (0, 0)))
    b_pad = b_tot + pad
    cvec = bias.reshape(1, f)

    dh, dx = pl.pallas_call(
        functools.partial(_bwd_dhdx_kernel, bb=bb, ci=ci, oi=oi, f=f,
                          interp=interpret),
        grid=(b_pad // bb,),
        in_specs=[
            pl.BlockSpec((bb, ci), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),      # hidden
            pl.BlockSpec((bb, ii), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),      # x
            pl.BlockSpec((bb, oi), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),      # g
            pl.BlockSpec(memory_space=pltpu.VMEM),      # kernel (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # bias (1, F)
        ],
        out_specs=[
            pl.BlockSpec((bb, ci), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, ii), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((b_pad, ci), hidden.dtype),
                   jax.ShapeDtypeStruct((b_pad, ii), x.dtype)],
        scratch_shapes=[
            pltpu.VMEM((bb, width_b), hidden.dtype),    # xt chunk
        ],
        interpret=interpret,
        name="hyper_apply_bwd_dhdx",
    )(hidden, x, g, kernel, cvec)

    ht = hidden.T  # (C, B) — tiny XLA transpose (0.2 MB at flagship)
    dk_w, db_w = pl.pallas_call(
        functools.partial(_bwd_dk_kernel, b_pad=b_pad, ci=ci, oi=oi, f=f,
                          interp=interpret),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),      # hidden^T (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # x (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # g (whole)
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),      # dK_w (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # db_w (whole)
        ],
        out_shape=[jax.ShapeDtypeStruct((ci, w), kernel.dtype),
                   jax.ShapeDtypeStruct((1, w), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((128, width_b), hidden.dtype),   # xt per 128 rows
        ],
        interpret=interpret,
        name="hyper_apply_bwd_dk",
    )(ht, x, g)

    # predicted-bias tail columns [W, F): dP there is just g — plain 2D dots
    g2 = g.astype(jnp.float32)
    dk_b = _mm(hidden, g, (((0,), (0,)), ((), ())),
               interpret).astype(kernel.dtype)                 # (C, O)
    db_b = jnp.sum(g2, axis=0)
    dk = jnp.concatenate([dk_w, dk_b], axis=1)
    db = jnp.concatenate([db_w[0], db_b]).astype(bias.dtype)
    return dh[:b_tot], dk, db, dx[:b_tot]


def _vjp_fwd(hidden, kernel, bias, x, out_ch, interpret):
    out = _fwd_impl(hidden, kernel, bias, x, out_ch, interpret)
    return out, (hidden, kernel, bias, x)


def _vjp_bwd(out_ch, interpret, res, g):
    hidden, kernel, bias, x = res
    if FUSED_BWD:
        return _fused_bwd(hidden, kernel, bias, x, g, out_ch, interpret)
    oi = out_ch
    ii = x.shape[1]
    w = oi * ii
    # standard XLA VJP (kept for A/B and as a fallback; its per-sample
    # weight relayouts cost ~1 ms/step at flagship dims)
    p = hidden @ kernel + bias
    pw = p[:, :w].reshape(-1, oi, ii)
    dx = jnp.einsum("bo,boi->bi", g, pw).astype(x.dtype)
    dw = (g[:, :, None] * x[:, None, :]).reshape(-1, w)
    dp = jnp.concatenate([dw, g], axis=1)                      # (B, F)
    dh = jax.lax.dot_general(dp, kernel, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32
                             ).astype(hidden.dtype)
    dk = jax.lax.dot_general(hidden, dp, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32
                             ).astype(kernel.dtype)
    db = jnp.sum(dp.astype(jnp.float32), axis=0).astype(bias.dtype)
    return dh, dk, db, dx


_hyper_apply.defvjp(_vjp_fwd, _vjp_bwd)


def hyper_apply(hidden, kernel, bias, x, *, out_ch: int,
                interpret: bool | None = None):
    """Fused predict+apply: ``((hidden @ kernel + bias) weights) @ x + beta``.

    hidden: (B, C) conditioning features (pre-last-layer FCBlock output)
    kernel: (C, F) last hyper Linear weight, F = out_ch * in_ch + out_ch,
            flattened out-major (f = o * in_ch + i) like the XLA path
    bias:   (F,)
    x:      (B, in_ch) per-sample input
    Returns (B, out_ch) in ``hidden.dtype``.
    """
    if interpret is None:
        from .config import interpret_default
        interpret = INTERPRET or interpret_default()
    return _hyper_apply(hidden, kernel, bias, x, out_ch, interpret)
