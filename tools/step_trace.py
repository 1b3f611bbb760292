"""Where does the train step's device time go? (run on the real chip)

Traces N headline train steps (bench.build config) under jax.profiler and
aggregates the TPU device lane's leaf events into HLO categories — the
measurement behind docs/PERFORMANCE.md's "Round 3b/4: where the whole step
goes" tables and the target list for the non-matmul-tail work (VERDICT r3
ask 4). Usage:

    python tools/step_trace.py [--iters 10] [--dump-top 40] [--keep DIR]

Prints one JSON object: per-category ms/step plus the top individual events.
Categories are assigned from the event name (XLA names device events after
the HLO instruction: ``fusion.N`` with a kind-revealing prefix on TPU, plus
``copy``/``convolution``/``dynamic-update-slice``/custom-call names).
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


def device_leaf_events(trace_dir: str):
    """All complete ('X') events on TPU device-lane pids, as
    (name, total_us, count)."""
    files = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    with gzip.open(files[-1]) as f:
        tr = json.load(f)
    dev_pids = set()
    for e in tr["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name" \
                and "TPU" in str(e.get("args", {}).get("name", "")):
            dev_pids.add(e["pid"])
    tot = collections.Counter()
    cnt = collections.Counter()
    for e in tr["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            tot[e["name"]] += e.get("dur", 0)
            cnt[e["name"]] += 1
    return [(n, tot[n], cnt[n]) for n in tot]


def categorize(name: str) -> str:
    n = name.lower()
    if "seg_attn" in n or "hyper_" in n and "fusion" not in n:
        return "pallas-kernel"
    if n.startswith("custom-call") or "tpu_custom_call" in n:
        return "custom-call"
    if "convolution" in n or n.startswith("dot") or "matmul" in n:
        return "convolution/dot"
    if n.startswith("copy") or "copy-start" in n or "copy-done" in n:
        return "copy"
    if "all-to-all" in n or "all-reduce" in n or "all-gather" in n \
            or "collective" in n or "reduce-scatter" in n:
        return "collective"
    if n.startswith("loop_") or "loop-fusion" in n:
        return "loop-fusion"
    if n.startswith(("bitcast", "pad", "reshape", "transpose", "slice",
                     "concatenate")):
        return "data-formatting"
    if n.startswith(("dynamic-update-slice", "dynamic-slice", "scatter",
                     "gather")):
        return "gather/scatter"
    if n.startswith(("reduce", "sort", "select-and-scatter")):
        return "reduce/sort"
    if "fusion" in n:
        return "fusion-other"
    if n.startswith(("infeed", "outfeed", "send", "recv")):
        return "host-io"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dump-top", type=int, default=40)
    ap.add_argument("--keep", default=None,
                    help="keep the raw trace under this directory")
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

    events = device_leaf_events(td)
    steps = args.iters * args.k
    cats = collections.Counter()
    for name, tot_us, _c in events:
        cats[categorize(name)] += tot_us / steps / 1e3   # ms/step
    top = sorted(events, key=lambda t: -t[1])[:args.dump_top]
    out = {
        "metric": "step_trace_ms_per_step",
        "config": {"batch": args.batch, "dtype": args.dtype,
                   "iters": args.iters, "k": args.k},
        "leaf_ms_per_step": round(sum(cats.values()), 3),
        "categories": {k: round(v, 3)
                       for k, v in sorted(cats.items(), key=lambda kv: -kv[1])},
        "top_events": [
            {"name": n, "ms_per_step": round(t / steps / 1e3, 4),
             "calls_per_step": round(c / steps, 1),
             "category": categorize(n)} for n, t, c in top],
        "trace_dir": td if args.keep else None,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
