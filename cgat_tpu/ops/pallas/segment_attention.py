"""Fused Pallas TPU kernel: segment softmax + weighted scatter-aggregate.

TPU-native replacement for the reference's torch_scatter/torch_geometric
gather-scatter hot path (reference CGAT/CGAT.py:319-326: PyG ``softmax`` over
``edge_index_i`` followed by ``scatter_add``): one kernel computes, per
destination node, ``out[n] = sum_e softmax(alpha)_e * m_e`` over that node's
incident edges.

Design (see /opt/skills/guides/pallas_guide.md):
* Edges are sorted by destination (guaranteed by the batch builder,
  cgat_tpu/data/batching.py), so each node's edges form one contiguous run.
  A CSR-style offsets array (one entry per node block) is scalar-prefetched.
* Grid over blocks of BN=128 destination nodes. Edge chunks are DMA'd
  HBM->VMEM double-buffered (chunk c+1 fills one slot while chunk c
  computes from the other); scatter within a chunk becomes a *one-hot
  membership matmul* on the MXU ((BN, BE) @ (BE, HF)) — TPU has no vector
  scatter, but the systolic array eats one-hot contractions. BE=768 is the
  largest chunk whose two slots fit VMEM alongside the accumulators, and
  measured fastest at real-data edge density.
* Numerical stabilisation is flash-attention style: a per-column running max
  over the node block's edges rescales the exp-sum and weighted-sum
  accumulators chunk by chunk. Softmax is shift-invariant, so any per-node
  constant gives the mathematically identical result; a blockwise shift only
  differs from PyG's per-segment max if logits within one node block span
  more than ~70 (exp underflow), far beyond trained-attention ranges.
* Membership comes from CSR row pointers, not per-edge destination ids:
  because edges are dst-sorted, edge ``e`` belongs to node ``n`` iff
  ``off[n] <= e < off[n+1]`` where ``off`` is the (host-side searchsorted)
  per-node edge-offset array. Each kernel receives tiny per-block ``lo``/
  ``hi`` offset rows (int32, one value per one-hot column) instead of the
  round-2 ``(E, 128)`` lane-broadcast dst array — removing 512 bytes/edge
  of pure index inflation from both kernels' HBM traffic and the wrapper's
  XLA-side broadcast materialisation.
* Custom VJP: the backward is embarrassingly parallel over edge blocks —
  d_alpha_e = p_e * g_n * (m_e - out_n), d_m_e = p_e * g_n — needing only the
  saved per-node shift, cotangent/denominator (folded into one array) and
  output gathered through the same one-hot matmul trick (exact for any shift
  as long as the denominator used it too).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = -1e30
EPS = 1e-16  # torch_geometric.utils.softmax denominator epsilon

BLOCK_NODES = 128   # destination nodes per grid step (lane width)
BLOCK_EDGES = 768   # edges per DMA chunk (x2 slots must fit VMEM)

# module-level default for the interpret flag (tests set True to run the
# kernels through the Pallas interpreter on CPU)
INTERPRET = False

# backward edge-block override for tuning (None = derive from the forward
# block by halving while > 256; see _vjp_bwd). Total gather-matmul FLOPs in
# the backward scale with E*(be+8), so smaller blocks do strictly less work —
# down to where DMA issue overhead dominates.
BWD_BLOCK_EDGES: int | None = None

# VMEM-residency budget for the backward's [q|max|out] node array (whole
# array staged HBM->VMEM once; per-block window copies become VMEM->VMEM,
# killing the ~92%-overlap HBM re-reads). Above the budget the HBM
# window-DMA path applies.
NODECAT_VMEM_BYTES = 8 * 2 ** 20


def _bwd_block(e_tot: int, be: int) -> int:
    """The backward's edge-block policy (shared so the forward can size the
    CSR offsets array it stashes for the backward)."""
    if BWD_BLOCK_EDGES and e_tot % BWD_BLOCK_EDGES == 0:
        return BWD_BLOCK_EDGES
    while be > 128 and e_tot % (be // 2) == 0:
        be //= 2
    return be


def _fwd_kernel(off_ref, alpha_hbm, m_hbm, lo_ref, hi_ref,
                out_ref, max_ref, den_ref,
                a_s, m_s, acc_num, acc_den, run_max, sems,
                *, bn, be, hf, e_hbm):
    # a_s/m_s may be bf16 (halved DMA); all arithmetic is f32
    i = pl.program_id(0)
    start = off_ref[i]
    end = off_ref[i + 1]
    # DMA starts must be sublane-aligned (8 rows for f32/int32); align down —
    # leading extra edges belong to earlier nodes and never match membership
    start_al = pl.multiple_of((start // 16) * 16, 16)
    nchunks = (end - start_al + be - 1) // be

    run_max[:] = jnp.full((8, hf), NEG_BIG, jnp.float32)
    acc_den[:] = jnp.zeros((bn, hf), jnp.float32)
    acc_num[:] = jnp.zeros((bn, hf), jnp.float32)

    edge_ids = jax.lax.broadcasted_iota(jnp.int32, (be, 1), 0)
    # lo/hi live whole in VMEM ((nblocks, bn) int32, a few KB); dynamic
    # SUBLANE slicing is fine on TPU (lane indexing would not be)
    lo = lo_ref[pl.ds(i, 1), :]                               # (1, BN)
    hi = hi_ref[pl.ds(i, 1), :]                               # (1, BN)

    # double-buffered chunk DMA: slot c%2 computes while slot (c+1)%2 fills.
    # The last chunk's window is clamped so it never reads past the array's
    # end (edge arrays are whole multiples of 16, e_hbm >= be) — the rows it
    # re-reads below the chunk's logical start are masked out of membership
    # and the running max by the per-row validity below, so no padding
    # chunk is needed and the wrapper's former (E + be) pad copy is gone.
    def chunk_base(c):
        logical = start_al + c * be          # 16-aligned by construction
        return pl.multiple_of(jnp.minimum(logical, e_hbm - be), 8)

    def chunk_dma(slot, c):
        base = chunk_base(c)
        return (
            pltpu.make_async_copy(alpha_hbm.at[pl.ds(base, be), :],
                                  a_s.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(m_hbm.at[pl.ds(base, be), :],
                                  m_s.at[slot], sems.at[slot, 1]),
        )

    @pl.when(nchunks > 0)
    def _():
        for cp in chunk_dma(0, 0):
            cp.start()

    def body(c, _):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nchunks)
        def _():
            for cp in chunk_dma(1 - slot, c + 1):
                cp.start()

        for cp in chunk_dma(slot, c):
            cp.wait()

        base = chunk_base(c)
        gid = base + edge_ids                                 # (BE, 1)
        # lower bound masks the re-read rows of a clamped last chunk (they
        # were processed by the previous chunk); upper bound is the block's
        # edge range as before
        valid = (gid >= start_al + c * be) & (gid < end)      # (BE, 1)
        validf = valid.astype(jnp.float32)
        # CSR membership one-hot: edge gid belongs to column n iff
        # off[node0+n] <= gid < off[node0+n+1] (edges are dst-sorted).
        # Leading aligned-down edges and trailing beyond-end edges match
        # no column; padded edges (gid >= n_real) match nothing because
        # the host clamps off to n_real.
        sel = jnp.where((gid >= lo) & (gid < hi), 1.0, 0.0)   # (BE, BN)

        a = a_s[slot].astype(jnp.float32)
        chunk_max = jnp.max(jnp.where(valid, a, NEG_BIG), axis=0,
                            keepdims=True)                    # (1, HF)
        old = run_max[0:1, :]
        new = jnp.maximum(old, chunk_max)
        scale = jnp.exp(old - new)                            # (1, HF)
        acc_den[:] = acc_den[:] * scale
        acc_num[:] = acc_num[:] * scale
        run_max[:] = jnp.broadcast_to(new, (8, hf))

        e = jnp.exp(a - new) * validf                         # (BE, HF)
        # one fused one-hot contraction for both sums: sel @ [e | e*m].
        # When the op runs in bf16 compute mode the weights/messages carry
        # bf16 precision already, so the contraction runs single-pass bf16
        # (f32 accumulation) — 82% -> MXU-peak headroom on the forward; in
        # f32 mode it stays a HIGHEST-precision f32 contraction.
        cat = jnp.concatenate(
            [e, e * m_s[slot].astype(jnp.float32)], axis=1)   # (BE, 2*HF)
        if a_s.dtype == jnp.bfloat16:
            acc = jax.lax.dot_general(
                sel.astype(jnp.bfloat16), cat.astype(jnp.bfloat16),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)            # (BN, 2*HF)
        else:
            acc = jax.lax.dot_general(
                sel, cat, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)           # (BN, 2*HF)
        acc_den[:] += acc[:, :hf]
        acc_num[:] += acc[:, hf:]
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)
    den = acc_den[:]
    # outputs store in the op's io dtype (bf16 in bf16 compute mode —
    # halves the f32 output writes and the backward's [q|max|out] staging;
    # the bwd math upcast these to bf16 anyway). f32 mode is unchanged.
    out_ref[:] = (acc_num[:] / (den + EPS)).astype(out_ref.dtype)
    den_ref[:] = den.astype(den_ref.dtype)
    max_ref[:] = jnp.broadcast_to(run_max[0:1, :], (bn, hf)
                                  ).astype(max_ref.dtype)


def _bwd_kernel(meta_ref, alpha_ref, m_ref, lo_ref, hi_ref, nodecat_hbm,
                dalpha_ref, dm_ref, nodecat_s, sems,
                *, be, hf, span, span_pad, align):
    j = pl.program_id(0)
    nprog = pl.num_programs(0)

    # one DMA + one gather matmul for all three per-node arrays
    # [g/(den+eps) | max | out] concatenated on the feature axis.
    # Double-buffered ACROSS grid steps (scratch + semaphores persist on
    # TPU): step j waits on the slot its predecessor prefetched and starts
    # step j+1's slice into the other slot before computing. The DMA base
    # (meta) is the host-side first dst node of the block, aligned down to
    # nodecat's sublane requirement (8 rows f32 / 16 bf16).
    def slice_dma(slot, idx):
        base = pl.multiple_of(meta_ref[idx], align)
        return pltpu.make_async_copy(nodecat_hbm.at[pl.ds(base, span), :],
                                     nodecat_s.at[slot, pl.ds(0, span)],
                                     sems.at[slot])

    @pl.when(j == 0)
    def _():
        slice_dma(0, 0).start()

    slot = jax.lax.rem(j, 2)

    @pl.when(j + 1 < nprog)
    def _():
        slice_dma(1 - slot, j + 1).start()

    slice_dma(slot, j).wait()
    if span_pad > span:
        # one-hot columns beyond span are exactly zero (hi window padded
        # with 0), but the matmul still reads those scratch rows — zero
        # them so stale VMEM (possible NaNs) can't propagate through 0 * x
        nodecat_s[slot, span:, :] = jnp.zeros(
            (span_pad - span, 3 * hf), nodecat_s.dtype)

    # CSR membership one-hot (same trick as the forward): edge j*be+e
    # belongs to column c iff off[n0+c] <= j*be+e < off[n0+c+1]; the lo/hi
    # windows are host-gathered per block. Padded edges match no column
    # (off is clamped to n_real), which also yields onseg == 0 for them.
    edge_ids = jax.lax.broadcasted_iota(jnp.int32, (be, 1), 0)
    gid = j * be + edge_ids                                   # (BE, 1)
    lo = lo_ref[pl.ds(j, 1), :]                               # (1, span_pad)
    hi = hi_ref[pl.ds(j, 1), :]
    sel = jnp.where((gid >= lo) & (gid < hi), 1.0, 0.0)       # (BE, span_pad)

    if nodecat_s.dtype == jnp.bfloat16:
        # bf16 compute mode: the gather matmul reads bf16 node slices
        # (halves the dominant DMA term; the kernel is HBM-bound)
        cat_e = jax.lax.dot_general(
            sel.astype(jnp.bfloat16), nodecat_s[slot],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)               # (BE, 3*HF)
    else:
        cat_e = jax.lax.dot_general(
            sel, nodecat_s[slot], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)              # (BE, 3*HF)
    q_e = cat_e[:, 0 * hf:1 * hf]      # g / (den + eps), folded host-side
    max_e = cat_e[:, 1 * hf:2 * hf]
    out_e = cat_e[:, 2 * hf:3 * hf]
    onseg = jnp.max(sel, axis=1, keepdims=True)               # (BE, 1)
    # p * g = exp(a - max)/(den+eps) * g = exp(a - max) * q
    pg = jnp.exp(alpha_ref[:].astype(jnp.float32) - max_e) * q_e * onseg
    dm_ref[:] = pg.astype(dm_ref.dtype)
    dalpha_ref[:] = (pg * (m_ref[:].astype(jnp.float32) - out_e)
                     ).astype(dalpha_ref.dtype)


def _node_offsets(edge_dst, n_real, n_hi):
    """CSR row pointers: off[n] = first edge with dst >= n, clamped to the
    real edge count so padded edges (a False-suffix pointing at the last
    node slot) belong to no node. Shape (n_hi + 1,)."""
    bounds = jnp.arange(1, n_hi + 1, dtype=jnp.int32)
    off = jnp.searchsorted(edge_dst, bounds, side="left").astype(jnp.int32)
    off = jnp.minimum(off, n_real)
    return jnp.concatenate([jnp.zeros((1,), jnp.int32), off])


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _edge_softmax_aggregate(alpha2, m2, dst2, hoffn, n_real, num_nodes, bn,
                            be, interpret):
    out, _, _, _ = _fwd_impl(alpha2, m2, dst2, hoffn, n_real, num_nodes, bn,
                             be, interpret)
    return out


def _fwd_impl(alpha2, m2, dst2, hoffn, n_real, num_nodes, bn, be, interpret):
    e_tot, hf = alpha2.shape
    nblocks = -(-num_nodes // bn)
    n_pad = nblocks * bn
    # per-node CSR pointers, computed ONCE per op: long enough for both the
    # forward's (n_pad) rows and the backward's windows (num_nodes + its
    # span), so the backward reuses it from the residuals instead of
    # re-running the searchsorted (wrapper cost, roofline.py)
    n_hi = max(n_pad, num_nodes + _bwd_block(e_tot, be) + 16)
    if hoffn.shape[0] >= n_hi + 1:
        # host-precomputed UNCLAMPED pointers (the collate ships them with
        # the batch): identical to the device searchsorted after clamping
        # to the real edge count — kills the 14-iteration binary-search
        # while-loop per step (~0.16 ms at flagship dims, round-5 trace)
        offn = jnp.minimum(hoffn[:n_hi + 1].astype(jnp.int32), n_real)
    else:
        offn = _node_offsets(dst2[:, 0], n_real, n_hi)        # (n_hi + 1,)
    # the per-block scalar-prefetch offsets are its every-bn-th entries,
    # and the lo/hi one-hot bounds are bn-wide rows
    offsets = offn[:n_pad + 1:bn]                             # (nblocks + 1,)
    lo = offn[:n_pad].reshape(nblocks, bn)                    # (nb, bn) int32
    hi = offn[1:n_pad + 1].reshape(nblocks, bn)
    # no trailing pad chunk: the kernel clamps the last DMA window to the
    # array end and masks the re-read rows (saves a full (E, HF) copy per
    # call — ~0.22 ms/step of `pad` at flagship dims, round-4 trace)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # alpha
            pl.BlockSpec(memory_space=pl.ANY),          # m
            pl.BlockSpec(memory_space=pltpu.VMEM),      # lo (whole array)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # hi (whole array)
        ],
        out_specs=[pl.BlockSpec((bn, hf), lambda i, off: (i, 0),
                                memory_space=pltpu.VMEM)] * 3,
        scratch_shapes=[
            pltpu.VMEM((2, be, hf), alpha2.dtype),
            pltpu.VMEM((2, be, hf), m2.dtype),
            pltpu.VMEM((bn, hf), jnp.float32),
            pltpu.VMEM((bn, hf), jnp.float32),
            pltpu.VMEM((8, hf), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = functools.partial(_fwd_kernel, bn=bn, be=be, hf=hf,
                               e_hbm=alpha2.shape[0])
    io_dtype = (jnp.bfloat16 if alpha2.dtype == jnp.bfloat16
                else jnp.float32)
    out, maxv, den = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_pad, hf), io_dtype)] * 3,
        interpret=interpret,
        name="seg_attn_fwd",
    )(offsets, alpha2, m2, lo, hi)
    return out[:num_nodes], maxv[:num_nodes], den[:num_nodes], offn


def _vjp_fwd(alpha2, m2, dst2, hoffn, n_real, num_nodes, bn, be, interpret):
    out, maxv, den, offn = _fwd_impl(alpha2, m2, dst2, hoffn, n_real,
                                     num_nodes, bn, be, interpret)
    return out, (alpha2, m2, dst2, n_real, maxv, den, out, offn)


def _vjp_bwd(num_nodes, bn, be, interpret, res, g):
    alpha2, m2, dst2, n_real, maxv, den, out, offn = res
    # fold the cotangent and the softmax denominator into one term (see
    # _bwd_call): q = g / (den + eps), in f32 whatever the io dtype
    q = g.astype(jnp.float32) / (den.astype(jnp.float32) + EPS)
    dalpha, dm = _bwd_call(alpha2, m2, dst2, n_real, q, maxv,
                           out, offn, num_nodes, be, interpret)
    return dalpha, dm, None, None, None


def _bwd_call(alpha2, m2, dst2, n_real, q, maxv, out, offn, num_nodes, be,
              interpret, cover_all=False):
    """Backward kernel launch shared by the single-array op and the
    local/halo pair op: d_alpha_e = p_e*g_n*(m_e - out_n), d_m_e = p_e*g_n
    with p_e = exp(alpha_e - maxv_n) * q_n and q = g/(den+eps). Exact for
    ANY per-node shift ``maxv`` as long as ``den``/``out`` used it too —
    which is what lets the pair op pass MERGED (gmax, den, out) node arrays
    here and get the true VJP of the union softmax per block.

    ``cover_all``: every block's one-hot window spans the WHOLE node range
    [0, num_nodes) instead of [first_dst, first_dst + be + align). The
    narrow window assumes each sorted BE-edge block's destinations span at
    most ``be + align`` node ids — true when (nearly) every node in the id
    range has an incident edge (the dense single-batch layout: every atom
    has >= 1 in-edge, padding is a suffix) but WRONG for sparse blocks:
    a halo block only touches boundary nodes, and an edge-sharded local
    block skips nodes whose in-edges are all remote (a split crystal's
    fragment), so a block can span arbitrarily many ids and out-of-window
    edges would silently get zero gradient (caught by the round-5 verify
    drive). The pair op therefore always passes cover_all=True — its
    num_nodes is a shard slice, so the wider gather matmul stays cheap."""
    e_tot, hf = alpha2.shape
    # much smaller blocks than fwd: the gather matmul is (BE, BE+8) x
    # (BE+8, 3*HF), so total backward gather FLOPs scale with E*(BE+8) —
    # smaller blocks do strictly less work until DMA/grid overhead bites.
    # Measured on v5e (flagship fwd+bwd, interleaved min-of-trials):
    # 256 -> 7.96 ms, 192 -> 7.28, 96 -> 6.59 (knee), 64 -> 6.77, 32 -> 7.09;
    # full train step +4.7% sparse / +5.5% dense at 96 vs 192.
    be = _bwd_block(e_tot, be)
    # narrow mode: a sorted BE-edge block touches at most BE distinct
    # nodes; +align covers the sublane alignment of the node-slice DMA
    # start (8 rows for f32, 16 for bf16 — Mosaic DMA requirement). The
    # one-hot's lane axis is padded up to span_pad with guaranteed-zero
    # columns (hi window 0).
    bf16 = alpha2.dtype == jnp.bfloat16
    align = 16 if bf16 else 8
    span = (num_nodes + align) if cover_all else (be + align)
    span_pad = -(-span // 128) * 128
    nblocks = e_tot // be

    if cover_all:
        starts = jnp.zeros((nblocks,), jnp.int32)
    else:
        starts = dst2[jnp.arange(nblocks) * be, 0].astype(jnp.int32)
        starts = (starts // align) * align
    meta = starts
    # per-block CSR windows for the membership one-hot: column c of block j
    # covers edges [off[starts_j + c], off[starts_j + c + 1]). offn comes
    # from the forward's residuals (computed once per op, length
    # >= num_nodes + span + 1 by construction in _fwd_impl — unless a
    # BWD_BLOCK_EDGES override makes the backward block exceed the
    # forward's, or cover_all widens the window, in which case recompute a
    # long-enough version).
    need = (span + 1) if cover_all else (num_nodes + span + 1)
    if offn.shape[0] < need:
        offn = _node_offsets(dst2[:, 0], n_real, need - 1)
    cidx = starts[:, None] + jnp.arange(span + 1, dtype=jnp.int32)[None, :]
    offw = offn[cidx]                                   # (nblocks, span + 1)
    lane_pad = ((0, 0), (0, span_pad - span))
    lo_win = jnp.pad(offw[:, :span], lane_pad)
    hi_win = jnp.pad(offw[:, 1:], lane_pad)

    # the gather DMA and one-hot matmul are 3*HF wide ([q|max|out]) with no
    # precision loss (one exact-ish divide; no extra log/exp rounding).
    # bf16 compute mode additionally ships the node slices AND the edge
    # cotangents in bf16 (the kernel is HBM-bound, docs/PERFORMANCE.md
    # roofline). Rounding maxv to bf16 scales each node's recomputed
    # exp(a - max) by exp(max_f32 - max_bf16) relative to the saved
    # denominator — bounded by |max| * 2^-8, the same order as the bf16
    # alpha/m rounding the mode already carries (measured vs the XLA bf16
    # path in tests/test_pallas_kernels.py).
    io_dtype = jnp.bfloat16 if bf16 else jnp.float32
    nodecat = jnp.concatenate(
        [q.astype(io_dtype), maxv.astype(io_dtype),
         out.astype(io_dtype)], axis=1)                       # (N, 3*HF)
    nodecat = jnp.pad(nodecat, ((0, span), (0, 0)))
    # consecutive blocks' node windows overlap almost entirely (a BE-edge
    # block advances ~BE/degree node ids), so per-block HBM window DMAs
    # re-read the same rows ~span/(BE/degree) times (~41 MB issued vs 3.4 MB
    # distinct per flagship call, round-5 trace). When the whole [q|max|out]
    # array fits a conservative VMEM budget, make it VMEM-resident — Pallas
    # stages it HBM->VMEM once and the per-block window copies become
    # VMEM->VMEM. Same kernel body either way.
    nodecat_vmem = (nodecat.shape[0] * 3 * hf
                    * jnp.dtype(io_dtype).itemsize) <= NODECAT_VMEM_BYTES

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((be, hf), lambda j, meta: (j, 0),
                         memory_space=pltpu.VMEM),      # alpha
            pl.BlockSpec((be, hf), lambda j, meta: (j, 0),
                         memory_space=pltpu.VMEM),      # m
            pl.BlockSpec(memory_space=pltpu.VMEM),      # lo windows (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # hi windows (whole)
            pl.BlockSpec(memory_space=(pltpu.VMEM if nodecat_vmem
                                       else pl.ANY)),   # [q|max|out]
        ],
        out_specs=[
            pl.BlockSpec((be, hf), lambda j, meta: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((be, hf), lambda j, meta: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, span_pad, 3 * hf), io_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_bwd_kernel, be=be, hf=hf, span=span,
                               span_pad=span_pad, align=align)
    dalpha, dm = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((e_tot, hf), io_dtype)] * 2,
        interpret=interpret,
        name="seg_attn_bwd",
    )(meta, alpha2, m2, lo_win, hi_win, nodecat)
    return dalpha, dm


_edge_softmax_aggregate.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# Local/halo edge-block PAIR op (edge-partitioned halo overlap)
# ---------------------------------------------------------------------------
# The edge-sharded collate layout splits every shard's edges into a
# LOCAL-src block and a HALO-src block (cgat_tpu/data/batching.py) so the
# local block's per-edge matmuls can overlap the boundary ``all_to_all``
# (SURVEY.md section 5.7). The softmax still normalises across both blocks:
# run the forward kernel per block (it already emits per-node shift and
# denominator) and merge flash-attention style; the backward reuses the
# per-block kernel with the MERGED (gmax, den, out) node arrays — exact,
# because the backward formula holds for any shift the denominator used.


def _pair_fwd_impl(al, ml, dl, nl, ah, mh_, dh, nh, hoffn_l, hoffn_h,
                   num_nodes, bn, be_l, be_h, interpret):
    out_l, max_l, den_l, offn_l = _fwd_impl(al, ml, dl, hoffn_l, nl,
                                            num_nodes, bn, be_l, interpret)
    out_h, max_h, den_h, offn_h = _fwd_impl(ah, mh_, dh, hoffn_h, nh,
                                            num_nodes, bn, be_h, interpret)
    # merge in f32 whatever the kernel's io dtype (bf16 in bf16 mode)
    out_l, max_l, den_l, out_h, max_h, den_h = (
        x.astype(jnp.float32)
        for x in (out_l, max_l, den_l, out_h, max_h, den_h))
    gmax = jnp.maximum(max_l, max_h)
    sl = jnp.exp(max_l - gmax)
    sh = jnp.exp(max_h - gmax)
    # out_b * (den_b + EPS) reconstructs each block's unnormalised numerator
    # exactly (one rounding trip); rescale both to the common shift gmax
    den = den_l * sl + den_h * sh
    num = out_l * (den_l + EPS) * sl + out_h * (den_h + EPS) * sh
    out = num / (den + EPS)
    return out, gmax, den, offn_l, offn_h


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13, 14))
def _pair_aggregate(al, ml, dl, nl, ah, mh_, dh, nh, hoffn_l, hoffn_h,
                    num_nodes, bn, be_l, be_h, interpret):
    out, _, _, _, _ = _pair_fwd_impl(al, ml, dl, nl, ah, mh_, dh, nh,
                                     hoffn_l, hoffn_h, num_nodes, bn, be_l,
                                     be_h, interpret)
    return out


def _pair_vjp_fwd(al, ml, dl, nl, ah, mh_, dh, nh, hoffn_l, hoffn_h,
                  num_nodes, bn, be_l, be_h, interpret):
    out, gmax, den, offn_l, offn_h = _pair_fwd_impl(
        al, ml, dl, nl, ah, mh_, dh, nh, hoffn_l, hoffn_h, num_nodes, bn,
        be_l, be_h, interpret)
    return out, (al, ml, dl, nl, ah, mh_, dh, nh, gmax, den, out,
                 offn_l, offn_h)


def _pair_vjp_bwd(num_nodes, bn, be_l, be_h, interpret, res, g):
    al, ml, dl, nl, ah, mh_, dh, nh, gmax, den, out, offn_l, offn_h = res
    q = g.astype(jnp.float32) / (den + EPS)
    # cover_all: both blocks of a sharded layout can be dst-SPARSE (halo
    # blocks touch only boundary nodes; local blocks skip nodes whose
    # in-edges are all remote), which breaks the narrow-window assumption —
    # see _bwd_call
    dal, dml = _bwd_call(al, ml, dl, nl, q, gmax, out, offn_l, num_nodes,
                         be_l, interpret, cover_all=True)
    dah, dmh = _bwd_call(ah, mh_, dh, nh, q, gmax, out, offn_h, num_nodes,
                         be_h, interpret, cover_all=True)
    return dal, dml, None, None, dah, dmh, None, None, None, None


_pair_aggregate.defvjp(_pair_vjp_fwd, _pair_vjp_bwd)


def _prep_flat(alpha2, m2, edge_dst, edge_mask, num_nodes, block_edges):
    """2D prep: pick the compute dtype, compute the real-edge count from the
    False-suffix mask, and pad the edge axis to a whole number of blocks
    (sublane-friendly: block sizes are multiples of 16 so bf16 DMA windows
    stay aligned even for tiny halo blocks)."""
    e_tot, hf = alpha2.shape
    keep = alpha2.dtype if alpha2.dtype == jnp.bfloat16 else jnp.float32
    alpha2 = alpha2.astype(keep)
    m2 = m2.astype(keep)
    dst2 = edge_dst.astype(jnp.int32).reshape(e_tot, 1)
    n_real = (jnp.sum(edge_mask.astype(jnp.int32)) if edge_mask is not None
              else jnp.asarray(e_tot, jnp.int32))
    be = min(block_edges, -(-e_tot // 16) * 16)
    if e_tot % be:
        extra = be - e_tot % be
        alpha2 = jnp.pad(alpha2, ((0, extra), (0, 0)))
        m2 = jnp.pad(m2, ((0, extra), (0, 0)))
        dst2 = jnp.pad(dst2, ((0, extra), (0, 0)),
                       constant_values=num_nodes - 1)
    return alpha2, m2, dst2, n_real, be


def _prep_block(alpha, m, edge_dst, edge_mask, num_nodes, block_edges):
    """(E, H, F) entry: flatten then 2D prep."""
    e_tot, h, f = alpha.shape
    return _prep_flat(alpha.reshape(e_tot, h * f), m.reshape(e_tot, h * f),
                      edge_dst, edge_mask, num_nodes, block_edges)


def _as_hoffn(offn):
    return (offn.astype(jnp.int32) if offn is not None
            else jnp.zeros((0,), jnp.int32))


def edge_softmax_aggregate_pair(alpha_l, m_l, dst_l, mask_l,
                                alpha_h, m_h, dst_h, mask_h, num_nodes, *,
                                offn_l=None, offn_h=None,
                                block_nodes: int = BLOCK_NODES,
                                block_edges: int = BLOCK_EDGES,
                                interpret: bool | None = None):
    """Fused union-softmax aggregate over a local/halo edge-block pair.

    Same contract as ``cgat_tpu.ops.attention.edge_softmax_aggregate_pair``
    (XLA path). Requirements per block: dst-sorted edges, False-suffix mask
    (the edge-sharded collate layout guarantees both per shard).
    ``offn_l``/``offn_h``: optional host-precomputed unclamped CSR pointers
    over each block's destinations (the edge-sharded collate's per-shard
    ``edge_dst_offn`` / ``halo_dst_offn`` slices)."""
    if interpret is None:
        from .config import interpret_default
        interpret = INTERPRET or interpret_default()
    e_l, h, f = alpha_l.shape
    hf = h * f
    if f == 1 or hf % 128 != 0:
        from ..attention import edge_softmax_aggregate_pair as xla_impl
        return xla_impl(alpha_l, m_l, dst_l, mask_l, alpha_h, m_h, dst_h,
                        mask_h, num_nodes, backend="xla")
    al, ml, dl, nl, be_l = _prep_block(alpha_l, m_l, dst_l, mask_l,
                                       num_nodes, block_edges)
    ah, mh_, dh, nh, be_h = _prep_block(alpha_h, m_h, dst_h, mask_h,
                                        num_nodes, block_edges)
    out = _pair_aggregate(al, ml, dl, nl, ah, mh_, dh, nh,
                          _as_hoffn(offn_l), _as_hoffn(offn_h), num_nodes,
                          block_nodes, be_l, be_h, interpret)
    return out.reshape(num_nodes, h, f).astype(alpha_l.dtype)


def edge_softmax_aggregate_pair_flat(alpha2_l, m2_l, dst_l, mask_l,
                                     alpha2_h, m2_h, dst_h, mask_h,
                                     num_nodes, *,
                                     offn_l=None, offn_h=None,
                                     block_nodes: int = BLOCK_NODES,
                                     block_edges: int = BLOCK_EDGES,
                                     interpret: bool | None = None):
    """2D entry of the local/halo pair op: both blocks are (E, H*F)
    head-major flat (the fused MH-network kernel's local output; the halo
    block — typically small and MH-ineligible — arrives as a reshaped
    einsum result) and the union-softmax result stays (N, H*F) flat. This
    is what lets the edge-sharded shard_map step run the round-4 production
    layout end to end: local MH kernel -> flat pair aggregate, with only
    the boundary block consuming the ``all_to_all``. Requirements per
    block: dst-sorted edges, False-suffix mask (each shard_map cell's local
    view of the edge-sharded collate layout guarantees both)."""
    if interpret is None:
        from .config import interpret_default
        interpret = INTERPRET or interpret_default()
    e_l, hf = alpha2_l.shape
    assert hf % 128 == 0, "flat pair entry requires lane-multiple H*F"
    al, ml, dl, nl, be_l = _prep_flat(alpha2_l, m2_l, dst_l, mask_l,
                                      num_nodes, block_edges)
    ah, mh_, dh, nh, be_h = _prep_flat(alpha2_h, m2_h, dst_h, mask_h,
                                       num_nodes, block_edges)
    out = _pair_aggregate(al, ml, dl, nl, ah, mh_, dh, nh,
                          _as_hoffn(offn_l), _as_hoffn(offn_h), num_nodes,
                          block_nodes, be_l, be_h, interpret)
    keep = alpha2_l.dtype if alpha2_l.dtype == jnp.bfloat16 else jnp.float32
    return out.astype(keep)


def edge_softmax_aggregate_flat(alpha2, m2, edge_dst, num_nodes, *,
                                edge_mask=None, offn=None,
                                block_nodes: int = BLOCK_NODES,
                                block_edges: int = BLOCK_EDGES,
                                interpret: bool | None = None):
    """2D entry: ``alpha2``/``m2`` are (E, H*F) head-major flat (the fused
    MH-network kernel's output layout) and the result stays (N, H*F) flat —
    no 3D round trip on either side. Same math as
    :func:`edge_softmax_aggregate` (columns are independent).

    ``offn``: optional host-precomputed UNCLAMPED CSR pointers over
    ``edge_dst`` (``CrystalBatch.edge_dst_offn``); replaces the per-step
    device searchsorted when long enough."""
    if interpret is None:
        from .config import interpret_default
        interpret = INTERPRET or interpret_default()
    e_tot, hf = alpha2.shape
    assert hf % 128 == 0, "flat entry requires lane-multiple H*F"
    be = min(block_edges, e_tot)
    n_real = (jnp.sum(edge_mask.astype(jnp.int32)) if edge_mask is not None
              else jnp.asarray(e_tot, jnp.int32))
    keep = alpha2.dtype if alpha2.dtype == jnp.bfloat16 else jnp.float32
    alpha2 = alpha2.astype(keep)
    m2 = m2.astype(keep)
    dst2 = edge_dst.astype(jnp.int32).reshape(e_tot, 1)
    if e_tot % be:
        extra = be - e_tot % be
        alpha2 = jnp.pad(alpha2, ((0, extra), (0, 0)))
        m2 = jnp.pad(m2, ((0, extra), (0, 0)))
        dst2 = jnp.pad(dst2, ((0, extra), (0, 0)),
                       constant_values=num_nodes - 1)
    hoffn = (offn.astype(jnp.int32) if offn is not None
             else jnp.zeros((0,), jnp.int32))
    out = _edge_softmax_aggregate(alpha2, m2, dst2, hoffn, n_real, num_nodes,
                                  block_nodes, be, interpret)
    return out.astype(keep)


def edge_softmax_aggregate(alpha, m, edge_dst, num_nodes, *, edge_mask=None,
                           offn=None,
                           block_nodes: int = BLOCK_NODES,
                           block_edges: int = BLOCK_EDGES,
                           interpret: bool | None = None):
    """Fused segment-softmax + weighted aggregate (Pallas TPU path).

    Same contract as cgat_tpu.ops.attention.edge_softmax_aggregate (XLA
    path). Requirements: edges sorted by ``edge_dst``; a False-suffix
    ``edge_mask`` (padding at the end — the batch builder's layout).
    Scalar attention (F == 1) and tiny feature dims fall back to XLA.
    ``offn``: optional host-precomputed unclamped CSR pointers over
    ``edge_dst`` (see :func:`edge_softmax_aggregate_flat`).
    """
    if interpret is None:
        # off-TPU (tests, dryruns on the virtual CPU mesh) the kernel runs in
        # the Pallas interpreter, so backend="pallas" is exercisable anywhere
        from .config import interpret_default
        interpret = INTERPRET or interpret_default()
    e_tot, h, f = alpha.shape
    hf = h * f
    if f == 1 or hf % 128 != 0:
        from ..attention import edge_softmax_aggregate as xla_impl
        return xla_impl(alpha, m, edge_dst, num_nodes, edge_mask=edge_mask,
                        backend="xla")
    be = min(block_edges, e_tot)
    n_real = (jnp.sum(edge_mask.astype(jnp.int32)) if edge_mask is not None
              else jnp.asarray(e_tot, jnp.int32))
    keep = alpha.dtype if alpha.dtype == jnp.bfloat16 else jnp.float32
    alpha2 = alpha.astype(keep).reshape(e_tot, hf)
    m2 = m.astype(keep).reshape(e_tot, hf)
    dst2 = edge_dst.astype(jnp.int32).reshape(e_tot, 1)
    if e_tot % be:
        # round the edge axis up to a whole number of blocks; padded rows sit
        # beyond n_real so every kernel path masks them out
        extra = be - e_tot % be
        alpha2 = jnp.pad(alpha2, ((0, extra), (0, 0)))
        m2 = jnp.pad(m2, ((0, extra), (0, 0)))
        dst2 = jnp.pad(dst2, ((0, extra), (0, 0)),
                       constant_values=num_nodes - 1)
    hoffn = (offn.astype(jnp.int32) if offn is not None
             else jnp.zeros((0,), jnp.int32))
    out = _edge_softmax_aggregate(alpha2, m2, dst2, hoffn, n_real, num_nodes,
                                  block_nodes, be, interpret)
    return out.reshape(num_nodes, h, f).astype(alpha.dtype)
