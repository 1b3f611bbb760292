"""Where does the train step's device time go? (run on the real chip)

Traces N headline train steps (bench.build config) under jax.profiler and
aggregates the TPU "XLA Ops" lane (leaf HLO events) by the profiler's own
``hlo_category``, with per-category bytes/FLOPs from the event args — the
measurement behind docs/PERFORMANCE.md's "where the whole step goes" tables
and the target list for the non-matmul-tail work (VERDICT r3 ask 4). Usage:

    python tools/step_trace.py [--iters 10] [--dump-top 30] [--keep DIR]

Prints one JSON object: per-category ms/step (+GB/step, GFLOP/step) and the
top individual leaf events with their HLO long names.
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def leaf_ops(trace_dir: str):
    """Leaf HLO events from the TPU 'XLA Ops' lane:
    (name, category, total_us, count, total_bytes, total_flops, long_name)."""
    files = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    with gzip.open(files[-1]) as f:
        tr = json.load(f)
    tpu_pids, op_lanes = set(), set()
    for e in tr["traceEvents"]:
        if e.get("ph") != "M":
            continue
        if e.get("name") == "process_name" \
                and "TPU" in str(e["args"].get("name", "")):
            tpu_pids.add(e["pid"])
        if e.get("name") == "thread_name" \
                and e["args"].get("name") == "XLA Ops":
            op_lanes.add((e["pid"], e.get("tid")))
    agg = {}
    for e in tr["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        if (e["pid"], e.get("tid")) not in op_lanes:
            continue
        a = e.get("args", {})
        name = e["name"]
        rec = agg.setdefault(name, [a.get("hlo_category", "?"), 0.0, 0, 0, 0,
                                    a.get("long_name", "")[:300]])
        rec[1] += e.get("dur", 0)
        rec[2] += 1
        rec[3] += int(a.get("bytes_accessed", 0))
        rec[4] += int(a.get("model_flops", 0) or 0)
    return [(n, c, us, cnt, b, fl, ln)
            for n, (c, us, cnt, b, fl, ln) in agg.items()]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dump-top", type=int, default=30)
    ap.add_argument("--keep", default=None)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--k", type=int, default=1,
                    help="steps_per_dispatch (1 isolates one step cleanly)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import build

    _ = float(jnp.sum(jnp.ones((4,))))  # axon: enter sync mode first
    step, state, batch, n_edges, _f = build(args.batch, args.dtype,
                                            steps_per_dispatch=args.k)
    state, m = step(state, batch)
    _ = float(m["loss"])  # compile + sync

    td = args.keep or tempfile.mkdtemp(prefix="steptrace_")
    jax.profiler.start_trace(td)
    for _ in range(args.iters):
        state, m = step(state, batch)
    _ = float(m["loss"])
    jax.profiler.stop_trace()

    events = leaf_ops(td)
    steps = args.iters * args.k
    cat_us = collections.Counter()
    cat_b = collections.Counter()
    cat_fl = collections.Counter()
    for _n, cat, us, _c, b, fl, _ln in events:
        cat_us[cat] += us / steps
        cat_b[cat] += b / steps
        cat_fl[cat] += fl / steps
    top = sorted(events, key=lambda t: -t[2])[:args.dump_top]
    out = {
        "metric": "step_trace_ms_per_step",
        "config": {"batch": args.batch, "dtype": args.dtype,
                   "iters": args.iters, "k": args.k},
        "leaf_ms_per_step": round(sum(cat_us.values()) / 1e3, 3),
        "categories": {
            k: {"ms": round(v / 1e3, 3),
                "gb": round(cat_b[k] / 1e9, 3),
                "gflop": round(cat_fl[k] / 1e9, 1)}
            for k, v in sorted(cat_us.items(), key=lambda kv: -kv[1])},
        "top_events": [
            {"name": n, "category": c,
             "ms_per_step": round(us / steps / 1e3, 4),
             "calls_per_step": round(cnt / steps, 1),
             "mb_per_step": round(b / steps / 1e6, 2),
             "gflop_per_step": round(fl / steps / 1e9, 2),
             "long_name": ln}
            for n, c, us, cnt, b, fl, ln in top],
        "trace_dir": td if args.keep else None,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
