"""Profiling and throughput observability.

The reference has no tracing at all (SURVEY.md section 5.1 — tqdm bars and
prints only); here: a jax.profiler trace context for TensorBoard-viewable
device traces, and a step-throughput meter (edges/s, graphs/s) the trainer
logs each epoch.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Capture a device trace viewable in TensorBoard/Perfetto under
    ``log_dir`` (no-op when log_dir is None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Accumulates per-epoch step counts and real (unpadded) edge/graph
    totals; ``rates()`` returns edges/s and graphs/s."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.t0 = time.perf_counter()
        self.steps = 0
        self.edges = 0
        self.graphs = 0

    def update(self, batch=None, *, edges: int | None = None,
               graphs: int | None = None):
        self.steps += 1
        if edges is not None:
            self.edges += edges
            self.graphs += graphs or 0
            return
        # fallback: derive from the batch masks. NOTE this is a device->host
        # read; on the axon tunnel every read costs ~an RTT — prefer passing
        # host-side counts (the collate fn records them in
        # collate.last_counts).
        import numpy as np
        self.edges += int(np.sum(np.asarray(batch.edge_mask)))
        self.graphs += int(np.sum(np.asarray(batch.graph_mask)))

    def rates(self) -> dict:
        dt = max(time.perf_counter() - self.t0, 1e-9)
        return {
            "edges_per_sec": self.edges / dt,
            "graphs_per_sec": self.graphs / dt,
            "steps_per_sec": self.steps / dt,
            "epoch_time": dt,
        }


def annotate(name: str):
    """Named profiler span for custom scopes."""
    return jax.profiler.TraceAnnotation(name)
