"""Per-kernel roofline accounting for the fused segment-attention kernels.

Substantiates the "speed-of-light" claim (BASELINE.md north star) with
numbers instead of adjectives: for the fused forward and backward Pallas
kernels (ops/pallas/segment_attention.py) this computes, from the exact
shapes and the kernel's own chunking policy,

* bytes moved between HBM and VMEM (the DMA program the kernel issues), and
* MXU FLOPs of the one-hot membership matmuls (the only matmuls inside),

then divides by measured kernel wall time to place each kernel against the
v5e rooflines. Run ``python -m cgat_tpu.utils.roofline`` on the TPU for the
measured table; bench.py embeds the summary in its JSON.

v5e peaks used (public spec): HBM ~819 GB/s, MXU 197 TFLOP/s bf16. The
one-hot contractions run with f32 accumulation at HIGHEST precision, whose
MXU rate is a fraction of bf16 peak (multi-pass); both fractions are
reported so the verdict does not hinge on the exact f32 multiplier.
"""
from __future__ import annotations

import os

import numpy as np

HBM_BYTES_PER_S = 819e9       # v5e HBM bandwidth
MXU_BF16_FLOPS = 197e12       # v5e bf16 systolic peak
F32_HIGHEST_FRACTION = 1 / 6  # approx f32-HIGHEST multi-pass MXU rate


def fwd_kernel_accounting(edge_dst, n_real: int, num_nodes: int, hf: int,
                          *, bn: int = 128, be: int = 768,
                          dtype_bytes: int = 2) -> dict:
    """Exact DMA bytes + MXU FLOPs of one fused forward call.

    Mirrors _fwd_kernel's chunking: per node block, edges [start_al, end)
    are DMA'd in ``be``-edge chunks (alpha + m at ``dtype_bytes``); each
    chunk does one (be, bn) x (be, 2*hf) one-hot contraction whose
    membership comes from per-block CSR lo/hi rows (2 x bn int32 per
    block — round 3 replaced the (be, 128) lane-broadcast dst array).
    """
    dst = np.asarray(edge_dst)[:n_real]
    nblocks = -(-num_nodes // bn)
    bounds = np.arange(1, nblocks + 1) * bn
    off = np.minimum(np.searchsorted(dst, bounds, side="left"), n_real)
    off = np.concatenate([[0], off])
    chunks = 0
    for i in range(nblocks):
        start_al = (off[i] // 16) * 16
        chunks += max(0, -(-(off[i + 1] - start_al) // be))
    n_pad = nblocks * bn
    e_pad = -(-np.asarray(edge_dst).shape[0] // be) * be
    read = chunks * be * (2 * hf * dtype_bytes) + nblocks * 2 * bn * 4
    write = 3 * n_pad * hf * 4                    # out, max, den (f32)
    # HBM-distinct bytes: consecutive node blocks re-read the boundary
    # chunk, but each edge row exists ONCE in HBM — re-reads hit the
    # just-fetched lines and do not consume fresh HBM bandwidth. The
    # roofline fraction must use distinct bytes or it reads >1 (r4 verdict).
    distinct = (e_pad * 2 * hf * dtype_bytes + nblocks * 2 * bn * 4 + write)
    flops = chunks * 2.0 * be * bn * (2 * hf)
    return {"dma_bytes": float(read + write),
            "dma_bytes_hbm": float(distinct),
            "mxu_flops": float(flops), "chunks": int(chunks)}


def bwd_block_edges(e_tot: int, be: int = 768,
                    override: int | None = None) -> int:
    """The backward's block-size policy (ops/pallas/segment_attention.py)."""
    if override and e_tot % override == 0:
        return override
    while be > 128 and e_tot % (be // 2) == 0:
        be //= 2
    return be


def bwd_kernel_accounting(e_tot: int, hf: int, *, be: int | None = None,
                          num_nodes: int | None = None,
                          dtype_bytes: int = 2) -> dict:
    """Exact DMA bytes + MXU FLOPs of one fused backward call. In bf16
    compute mode (dtype_bytes=2) the nodecat slices and the output
    cotangents also travel at 2 bytes; membership comes from per-block
    CSR lo/hi windows (2 x span_pad int32 per block) instead of the
    (E, 128) dst broadcast (both round 3). ``dma_bytes`` counts the DMA
    program as issued (consecutive blocks re-read overlapping node
    windows ~be/overlap times); ``dma_bytes_hbm`` counts each HBM byte
    once — the roofline denominator (re-reads coalesce; r4 verdict)."""
    if be is None:
        be = bwd_block_edges(e_tot)
    span = be + (16 if dtype_bytes == 2 else 8)
    span_pad = -(-span // 128) * 128
    nblocks = e_tot // be
    edges = e_tot * 2 * hf * dtype_bytes                  # alpha + m
    windows = nblocks * 2 * span_pad * 4                  # lo/hi
    write = 2 * e_tot * hf * dtype_bytes                  # dalpha, dm
    read = edges + windows + nblocks * span * 3 * hf * dtype_bytes
    n_dist = (num_nodes + span) if num_nodes else nblocks * span
    distinct = edges + windows + n_dist * 3 * hf * dtype_bytes + write
    flops = nblocks * 2.0 * be * span_pad * (3 * hf)
    return {"dma_bytes": float(read + write),
            "dma_bytes_hbm": float(distinct),
            "mxu_flops": float(flops), "block_edges": int(be)}


def summarize(acct: dict, seconds: float, *,
              bf16_matmul: bool = False) -> dict:
    """Place one kernel run on the rooflines. ``bf16_matmul``: the one-hot
    contractions run single-pass bf16 (the kernel's bf16-compute mode), so
    the relevant MXU fraction is the bf16 one. The HBM fraction uses
    ``dma_bytes_hbm`` (each HBM byte counted once) when the accounting
    provides it — issued-DMA rates can exceed the HBM peak when windows
    overlap and re-reads coalesce, which made round-4's fractions read >1
    (r4 verdict ask 6); ``dma_gb_per_s`` still reports the issued rate."""
    hbm_bytes = acct.get("dma_bytes_hbm", acct["dma_bytes"])
    gbps = acct["dma_bytes"] / seconds / 1e9
    tflops = acct["mxu_flops"] / seconds / 1e12
    hbm_frac = hbm_bytes / seconds / HBM_BYTES_PER_S
    mxu_frac_bf16 = tflops * 1e12 / MXU_BF16_FLOPS
    mxu_frac_f32 = mxu_frac_bf16 / F32_HIGHEST_FRACTION
    mxu_frac = mxu_frac_bf16 if bf16_matmul else mxu_frac_f32
    return {
        "seconds": seconds,
        "dma_gb_per_s": round(gbps, 1),
        "hbm_gb_per_s": round(hbm_bytes / seconds / 1e9, 1),
        "hbm_fraction": round(hbm_frac, 3),
        "mxu_tflops": round(tflops, 1),
        "mxu_fraction_bf16_peak": round(mxu_frac_bf16, 3),
        "mxu_fraction_f32_highest": round(mxu_frac_f32, 3),
        "bound": "mxu" if mxu_frac > hbm_frac else "hbm",
    }


def hyper_fwd_accounting(b: int, c: int, i: int, o: int,
                         dtype_bytes: int = 2) -> dict:
    """DMA bytes + MXU FLOPs of one fused hyper_apply forward call
    (ops/pallas/hyper_apply.py::_fwd_kernel): predict matmul (B, C) x (C, F)
    plus the chunk-local one-hot apply (B, G*I) x (G*I, G) per F-chunk
    (the round-4 rework shrank the apply contraction from (W, O) to
    (G*I, G) — the old accounting still counted 2*W*O and overstated the
    kernel's MXU fraction); K stays resident in VMEM (read once)."""
    from ..ops.pallas.hyper_apply import GROUP_O
    f = o * i + o
    w = o * i
    read = (b * c + b * i + c * f) * dtype_bytes + f * dtype_bytes
    write = b * o * dtype_bytes
    flops = b * (2.0 * c * f + 2.0 * w * GROUP_O)
    return {"dma_bytes": float(read + write), "mxu_flops": float(flops)}


def hyper_bwd_accounting(b: int, c: int, i: int, o: int,
                         dtype_bytes: int = 2) -> dict:
    """Combined accounting of the two fused backward kernels
    (hyper_apply_bwd_dhdx + hyper_apply_bwd_dk). MXU terms per row: dhdx
    runs P-recompute (2*C*W) + dh (2*W*C) + the bias tail (2*O*C); dK runs
    h^T @ dP (2*C*W). The round-4 rework replaced the cotangent-replication
    one-hot matmul and the dx contraction with VPU lane broadcasts/slice
    adds — the old accounting still counted their MXU FLOPs, which is why
    hyper_bwd read 2.09x 'of peak' in BENCH_r04 (r4 verdict ask 6)."""
    f = o * i + o
    w = o * i
    # dh/dx kernel: reads hidden/x/g blocks + K resident; writes dh, dx
    read = (b * (c + i + o) + c * f) * dtype_bytes
    write = b * (c + i) * dtype_bytes
    flops = b * (4.0 * c * w + 2.0 * o * c)
    # dK kernel: h^T/x/g resident (read once); writes dK + db
    read += (b * (c + i + o)) * dtype_bytes
    write += (c * w) * dtype_bytes + f * 4
    flops += b * 2.0 * c * w
    return {"dma_bytes": float(read + write), "mxu_flops": float(flops)}


def mh_fwd_accounting(e_tot: int, cat: int, hid: int, f: int, heads: int,
                      dtype_bytes: int = 2) -> dict:
    """DMA bytes + MXU FLOPs of one fused MultiHead-network forward call
    (ops/pallas/mh_network.py::_fwd_kernel): fc_in (E, cat) x (cat, H*hid)
    + H grouped (E, hid) x (hid, F) fc_out matmuls; weights VMEM-resident
    (read once); writes the (E, H*F) output AND the (E, H*hid) saved
    activation for the VJP."""
    hw = heads * hid
    read = (e_tot * cat + cat * hw + hw + hw * f + heads * f) * dtype_bytes
    write = e_tot * (heads * f + hw) * dtype_bytes
    flops = 2.0 * e_tot * (cat * hw + hw * f)
    return {"dma_bytes": float(read + write),
            "mxu_flops": float(flops)}


def mh_bwd_accounting(e_tot: int, cat: int, hid: int, f: int, heads: int,
                      dtype_bytes: int = 2) -> dict:
    """DMA bytes + MXU FLOPs of one fused MultiHead-network backward call
    (_bwd_kernel): dh (H grouped (E, F) x (F, hid)), dx (E, H*hid) x
    (H*hid, cat), dWin (cat, E) x (E, H*hid), dWout (H x (hid, E) x
    (E, F)); weight grads accumulate in VMEM f32 and are written once."""
    hw = heads * hid
    read = (e_tot * (cat + hw + heads * f)        # x, h, g blocks
            + cat * hw + hw * f) * dtype_bytes    # Win, Wout resident
    write = e_tot * cat * dtype_bytes + (cat * hw + hw + hw * f
                                         + heads * f) * 4
    flops = 2.0 * e_tot * (hw * f          # dh
                           + hw * cat      # dx
                           + cat * hw      # dWin
                           + hw * f)       # dWout
    return {"dma_bytes": float(read + write),
            "mxu_flops": float(flops)}


def headline_shapes(batch, heads: int = 5, fea: int = 128):
    """(edge_dst, n_real, num_nodes, hf, e_tot_padded) for a collated batch,
    matching what edge_softmax_aggregate hands the kernel."""
    import numpy as np
    dst = np.asarray(batch.edge_dst)
    n_real = int(np.asarray(batch.edge_mask).sum())
    e_tot = dst.shape[0]
    be = 768
    if e_tot % be:
        e_tot += be - e_tot % be
    return dst, n_real, int(batch.nodes.shape[0]), heads * fea, e_tot


def _device_kernel_times(trace_dir: str) -> dict:
    """Parse a jax.profiler trace: mean per-call device duration of each
    named kernel event and of everything else on the TPU lane."""
    import collections
    import glob
    import gzip
    import json

    files = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    with gzip.open(files[-1]) as f:
        tr = json.load(f)
    dev_pids = {e["pid"] for e in tr["traceEvents"]
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e["args"].get("name", ""))}
    tot = collections.Counter()
    cnt = collections.Counter()
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            tot[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    return {name: (tot[name] / cnt[name] / 1e6, cnt[name]) for name in tot}


def _device_kernel_starts(trace_dir: str, name_substr: str) -> list:
    """Sorted start timestamps (seconds) of device-lane events whose name
    contains ``name_substr``. Median start-to-start spacing of back-to-back
    kernels is the drain-inclusive steady-state per-call time — per-event
    durations close before the last double-buffered DMA drains, which made
    the r4 backward roofline read 2.4x HBM peak (r4 verdict ask 6)."""
    import glob
    import gzip
    import json

    files = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    with gzip.open(files[-1]) as f:
        tr = json.load(f)
    dev_pids = {e["pid"] for e in tr["traceEvents"]
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e["args"].get("name", ""))}
    starts = [e["ts"] / 1e6 for e in tr["traceEvents"]
              if e.get("ph") == "X" and e.get("pid") in dev_pids
              and name_substr in e["name"]]
    return sorted(starts)


def _steady_per_call(starts: list) -> float:
    """Median start-to-start delta of consecutive same-kernel events."""
    if len(starts) < 2:
        return float("nan")
    deltas = np.diff(np.asarray(starts))
    return float(np.median(deltas))


def measure_kernels(batch_size: int = 64, iters: int = 20, trials: int = 0):
    """Device-trace measurement of the fused kernels at headline shapes.

    Wall-clock over the axon tunnel is polluted by ~1 ms dispatch latency —
    far larger than the kernels themselves — so times come from the
    jax.profiler device lane: per-call duration of the named pallas calls
    (seg_attn_fwd / seg_attn_bwd) plus the surrounding jit's total device
    time (= kernel + the pad/copy wrapper XLA adds)."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from ..data import collate
    from ..data.synthetic import random_graphs
    from ..ops.pallas import edge_softmax_aggregate as op

    H, F = 5, 128
    graphs = random_graphs(0, batch_size, n_atoms_range=(8, 16), max_nbr=24)
    batch = collate(graphs, max_nbr=24, node_bucket=64)
    dst, n_real, num_nodes, hf, e_pad = headline_shapes(batch, H, F)
    e_slots = batch.edge_src.shape[0]
    rng = np.random.default_rng(0)
    alpha = jnp.asarray(rng.standard_normal((e_slots, H, F)), jnp.bfloat16)
    m = jnp.asarray(rng.standard_normal((e_slots, H, F)), jnp.bfloat16)

    fwd = jax.jit(lambda a, mm: op(a, mm, batch.edge_dst, num_nodes,
                                   edge_mask=batch.edge_mask))
    grad = jax.jit(jax.grad(lambda a, mm: jnp.sum(
        op(a, mm, batch.edge_dst, num_nodes,
           edge_mask=batch.edge_mask).astype(jnp.float32)), argnums=(0, 1)))

    r = fwd(alpha, m)
    _ = float(jnp.sum(r.astype(jnp.float32)))          # compile + sync
    g = grad(alpha, m)
    _ = float(jnp.sum(g[0].astype(jnp.float32)))

    with tempfile.TemporaryDirectory() as td:
        jax.profiler.start_trace(td)
        for _ in range(iters):
            r = fwd(alpha, m)
        _ = float(jnp.sum(r.astype(jnp.float32)))
        for _ in range(iters):
            g = grad(alpha, m)
        _ = float(jnp.sum(g[0].astype(jnp.float32)))
        jax.profiler.stop_trace()
        times = _device_kernel_times(td)

    def named(prefix):
        for name, (dur, _n) in times.items():
            if prefix in name:
                return dur
        return float("nan")

    t_fwd = named("seg_attn_fwd")
    t_bwd = named("seg_attn_bwd")
    # total device time across both jits / iters, minus kernels -> wrapper
    total_dev = sum(dur * n for name, (dur, n) in times.items()
                    if name.startswith("jit_"))
    wrapper = max(total_dev / iters - t_fwd * 2 - t_bwd, 0.0)

    # drain-inclusive steady-state per-call time: K back-to-back kernel
    # launches inside ONE jit (the wrapper's offset/window computations are
    # loop-invariant, so XLA CSEs them and the kernels run consecutively);
    # median start-to-start spacing includes the DMA drain that per-event
    # durations miss. Used as the roofline denominator.
    from ..ops.pallas.segment_attention import EPS, _bwd_call, _fwd_impl
    if e_slots % 768 == 0:
        hf_flat = H * F
        alpha2 = alpha.reshape(e_slots, hf_flat)
        m2 = m.reshape(e_slots, hf_flat)
        dst2 = batch.edge_dst.astype(jnp.int32).reshape(e_slots, 1)
        n_real_t = jnp.sum(batch.edge_mask.astype(jnp.int32))
        K = 8
        ins = [(alpha2 * (1.0 + 0.01 * k), m2 * (1.0 - 0.01 * k))
               for k in range(K)]
        ins = jax.tree.map(jnp.asarray, ins)

        no_hoffn = jnp.zeros((0,), jnp.int32)

        @jax.jit
        def fwd_many(ins):
            return [_fwd_impl(a, mm, dst2, no_hoffn, n_real_t, num_nodes,
                              128, 768, False)[0] for a, mm in ins]

        out_b, maxv_b, den_b, offn_b = jax.jit(
            lambda a, mm: _fwd_impl(a, mm, dst2, no_hoffn, n_real_t,
                                    num_nodes, 128, 768, False))(alpha2, m2)
        q_b = (2.0 * out_b) / (den_b + EPS)

        @jax.jit
        def bwd_chain(a, mm):
            for _ in range(K):
                a, mm = _bwd_call(a, mm, dst2, n_real_t, q_b, maxv_b, out_b,
                                  offn_b, num_nodes, 768, False)
            return a, mm

        r = fwd_many(ins)
        _ = float(jnp.sum(r[0].astype(jnp.float32)))
        a_c, m_c = bwd_chain(alpha2, m2)
        _ = float(jnp.sum(a_c.astype(jnp.float32)))
        with tempfile.TemporaryDirectory() as td2:
            jax.profiler.start_trace(td2)
            r = fwd_many(ins)
            _ = float(jnp.sum(r[0].astype(jnp.float32)))
            a_c, m_c = bwd_chain(alpha2, m2)
            _ = float(jnp.sum(a_c.astype(jnp.float32)))
            jax.profiler.stop_trace()
            t_fwd_ss = _steady_per_call(
                _device_kernel_starts(td2, "seg_attn_fwd"))
            t_bwd_ss = _steady_per_call(
                _device_kernel_starts(td2, "seg_attn_bwd"))
        if np.isfinite(t_fwd_ss):
            t_fwd = max(t_fwd, t_fwd_ss)
        if np.isfinite(t_bwd_ss):
            t_bwd = max(t_bwd, t_bwd_ss)

    facct = fwd_kernel_accounting(dst, n_real, num_nodes, hf)
    bacct = bwd_kernel_accounting(e_pad, hf, num_nodes=num_nodes)
    return {
        "config": {"batch": batch_size, "edge_slots": e_slots,
                   "real_edges": n_real, "node_slots": num_nodes, "hf": hf},
        "fwd": {**facct, **summarize(facct, t_fwd, bf16_matmul=True)},
        "bwd": {**bacct, **summarize(bacct, t_bwd, bf16_matmul=True)},
        "xla_wrapper_us_per_call": round(wrapper / 3 * 1e6, 1),
    }


def measure_hyper_kernels(b: int = 768, c: int = 128, i_ch: int = 128,
                          o_ch: int = 128, iters: int = 20):
    """Device-trace measurement of the fused hyper predict+apply kernels at
    the flagship per-node call-site shape (B = node slots of a batch-64
    collate, C = I = O = 128). Same methodology as measure_kernels."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from ..ops.pallas.hyper_apply import hyper_apply

    f = o_ch * i_ch + o_ch
    rng = np.random.default_rng(0)
    hidden = jnp.asarray(rng.standard_normal((b, c)), jnp.bfloat16)
    kernel = jnp.asarray(rng.standard_normal((c, f)) * 0.01, jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((f,)) * 0.01, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((b, i_ch)), jnp.bfloat16)

    # named wrappers so the two jits are distinguishable in the trace
    def hyper_fwd_fn(h, xx):
        return hyper_apply(h, kernel, bias, xx, out_ch=o_ch)

    def hyper_grad_fn(h, xx):
        # sum(out**2): a DATA-DEPENDENT cotangent — with plain sum() the
        # cotangent is a compile-time constant and XLA simplifies the
        # backward (measured 97 -> 44 us of fiction)
        return jax.grad(lambda hh, xxx: jnp.sum(
            hyper_apply(hh, kernel, bias, xxx,
                        out_ch=o_ch).astype(jnp.float32) ** 2),
            argnums=(0, 1))(h, xx)

    fwd = jax.jit(hyper_fwd_fn)
    grad = jax.jit(hyper_grad_fn)

    r = fwd(hidden, x)
    _ = float(jnp.sum(r.astype(jnp.float32)))
    g = grad(hidden, x)
    _ = float(jnp.sum(g[0].astype(jnp.float32)))

    with tempfile.TemporaryDirectory() as td:
        jax.profiler.start_trace(td)
        for _ in range(iters):
            r = fwd(hidden, x)
        _ = float(jnp.sum(r.astype(jnp.float32)))
        for _ in range(iters):
            g = grad(hidden, x)
        _ = float(jnp.sum(g[0].astype(jnp.float32)))
        jax.profiler.stop_trace()
        times = _device_kernel_times(td)

    def named(prefix):
        # mean per-call duration across matching event names (the fwd
        # kernel legitimately appears twice: standalone jit + inside the
        # grad jit's custom-vjp forward)
        hits = [dur for name, (dur, _n) in times.items() if prefix in name]
        return float(np.mean(hits)) if hits else float("nan")

    t_fwd = named("hyper_apply_fwd")
    # the backward runs two kernels (dh/dx + dK). XLA folds the whole vjp
    # into ONE traced region named after the dhdx transpose on this runtime
    # (it contains both kernels + the small bias-tail dots), so per-kernel
    # events are absent; the dhdx-named region IS the backward total. Last
    # resort: (grad-jit device total) - (fwd kernel, which the custom-vjp
    # forward re-runs inside the grad jit).
    t_dhdx, t_dk = named("hyper_apply_bwd_dhdx"), named("hyper_apply_bwd_dk")
    if np.isfinite(t_dhdx) and np.isfinite(t_dk):
        t_bwd = t_dhdx + t_dk
    elif np.isfinite(t_dhdx):
        t_bwd = t_dhdx
    else:
        t_grad_total = named("jit_hyper_grad_fn")
        if np.isfinite(t_grad_total) and np.isfinite(t_fwd):
            t_bwd = max(t_grad_total - t_fwd, 1e-9)
        else:
            t_bwd = float("nan")

    facct = hyper_fwd_accounting(b, c, i_ch, o_ch)
    bacct = hyper_bwd_accounting(b, c, i_ch, o_ch)
    return {
        "config": {"b": b, "c": c, "i": i_ch, "o": o_ch},
        "fwd": {**facct, **summarize(facct, t_fwd, bf16_matmul=True)},
        "bwd": {**bacct, **summarize(bacct, t_bwd, bf16_matmul=True)},
    }


def measure_mh_kernels(e_tot: int = 8448, cat: int = 384, hid: int = 256,
                       f: int = 128, heads: int = 5, iters: int = 20):
    """Device-trace measurement of the fused MultiHead-network kernel at
    the flagship per-edge call-site shape (E = edge slots of a batch-64
    collate, cat = 2*128+128). Same methodology as measure_hyper_kernels;
    r4 verdict ask 2 (the mh kernels were absent from the roofline)."""
    import tempfile

    import jax
    import jax.numpy as jnp

    from ..ops.pallas.mh_network import mh_network

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((e_tot, cat)), jnp.bfloat16)
    win = jnp.asarray(rng.standard_normal((cat, heads * hid)) * 0.05,
                      jnp.bfloat16)
    b_in = jnp.asarray(rng.standard_normal((heads * hid,)) * 0.05,
                       jnp.bfloat16)
    wout = jnp.asarray(rng.standard_normal((heads * hid, f)) * 0.05,
                       jnp.bfloat16)
    b_out = jnp.asarray(rng.standard_normal((heads * f,)) * 0.05,
                        jnp.bfloat16)

    def mh_fwd_fn(xx):
        return mh_network(xx, win, b_in, wout, b_out, heads=heads, hid=hid,
                          f=f)

    def mh_grad_fn(xx):
        # sum(out**2): data-dependent cotangent so XLA cannot simplify
        return jax.grad(lambda v: jnp.sum(
            mh_network(v, win, b_in, wout, b_out, heads=heads, hid=hid,
                       f=f).astype(jnp.float32) ** 2))(xx)

    fwd = jax.jit(mh_fwd_fn)
    grad = jax.jit(mh_grad_fn)
    r = fwd(x)
    _ = float(jnp.sum(r.astype(jnp.float32)))
    g = grad(x)
    _ = float(jnp.sum(g.astype(jnp.float32)))

    with tempfile.TemporaryDirectory() as td:
        jax.profiler.start_trace(td)
        for _ in range(iters):
            r = fwd(x)
        _ = float(jnp.sum(r.astype(jnp.float32)))
        for _ in range(iters):
            g = grad(x)
        _ = float(jnp.sum(g.astype(jnp.float32)))
        jax.profiler.stop_trace()
        times = _device_kernel_times(td)

    def named(prefix):
        hits = [dur for name, (dur, _n) in times.items() if prefix in name]
        return float(np.mean(hits)) if hits else float("nan")

    t_fwd = named("mh_net_fwd")
    t_bwd = named("mh_net_bwd")
    facct = mh_fwd_accounting(e_tot, cat, hid, f, heads)
    bacct = mh_bwd_accounting(e_tot, cat, hid, f, heads)
    return {
        "config": {"e": e_tot, "cat": cat, "hid": hid, "f": f,
                   "heads": heads},
        "fwd": {**facct, **summarize(facct, t_fwd, bf16_matmul=True)},
        "bwd": {**bacct, **summarize(bacct, t_bwd, bf16_matmul=True)},
    }


def main():
    import json
    print(json.dumps(measure_kernels(), indent=2))


if __name__ == "__main__":
    main()
