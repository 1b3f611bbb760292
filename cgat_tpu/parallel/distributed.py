"""Multi-process (multi-host pod) support.

TPU-native replacement for the reference's multi-node DDP launch
(reference CGAT/train.py:100-104: PyTorch-Lightning ``num_nodes``/NCCL).
On a pod slice, one Python process runs per host; ``jax.distributed``
stitches their local chips into one global device list, the ('dp', 'edge')
mesh spans all of them, and the jitted shard_map train step executes SPMD —
gradient psums ride ICI exactly as in the single-host case.

Data stays process-local: every process computes the same deterministic
shuffle order (same seed), collates ONLY the dp-replica chunks that live on
its own chips (``ParallelLoader(process_index=..., process_count=...)``), and
wraps them into global ``jax.Array``s via ``make_array_from_callback`` — the
callback is only invoked for addressable shards, so no host ever materialises
another host's batch.

Tested by ``tests/test_multihost.py``: two local processes (gloo CPU
collectives) train the real model and must reproduce the single-process
trajectory exactly.
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> bool:
    """Initialise ``jax.distributed`` when launch env vars are present.

    Reads ``JAX_COORDINATOR_ADDRESS`` (+ optional ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID``; on TPU pods the runtime infers both). No-op (False)
    when the variables are absent or a previous call already initialised.
    On CPU backends the gloo collectives implementation is selected — the
    simulated-pod path (SURVEY.md §4) and the test suite rely on it.
    """
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coord:
        return False
    # must run BEFORE any backend initialisation, so only inspect config/env
    # (jax.process_count()/default_backend() would initialise the backend)
    from jax._src import distributed as _dist
    if getattr(_dist.global_state, "client", None) is not None:
        return True  # already initialised
    kwargs = {}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    platforms = (jax.config.jax_platforms
                 or os.environ.get("JAX_PLATFORMS", ""))
    if "cpu" in str(platforms):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coord, **kwargs)
    return True


def local_dp_rows(mesh: Mesh) -> tuple[int, int]:
    """(offset, count) of the contiguous dp-row range owned by this process.

    Requires the ``edge`` axis not to straddle processes (edge-partition
    collectives must ride ICI, never DCN — place ``edge`` innermost, which
    :func:`make_mesh` does) and each process's dp rows to be contiguous.
    """
    pid = jax.process_index()
    devs = mesh.devices
    if devs.ndim == 1:
        devs = devs[:, None]
    fully = [i for i in range(devs.shape[0])
             if all(d.process_index == pid for d in devs[i].flat)]
    partly = [i for i in range(devs.shape[0])
              if any(d.process_index == pid for d in devs[i].flat)]
    if fully != partly:
        raise ValueError(
            "edge axis straddles processes; lay out meshes with whole dp "
            f"rows per host (process {pid}: full={fully} touched={partly})")
    if fully != list(range(fully[0], fully[0] + len(fully))):
        raise ValueError(f"non-contiguous dp rows for process {pid}: {fully}")
    return fully[0], len(fully)


def make_batch_sharder(mesh: Mesh, pspecs):
    """Returns ``shard(stacked_batch) -> global batch`` for the shard_map
    train/eval steps.

    Single-process: a plain ``device_put`` onto the NamedShardings.
    Multi-process: the input is this process's LOCAL dp rows only
    (``ParallelLoader`` with ``process_index``/``process_count``); each leaf
    becomes a global ``jax.Array`` whose addressable shards are filled from
    the local rows via ``make_array_from_callback``.
    """
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), pspecs,
                             is_leaf=lambda x: isinstance(x, P))
    if jax.process_count() == 1:
        def shard(batch):
            return jax.device_put(batch, shardings)
        return shard

    dp_global = mesh.shape.get("dp", mesh.devices.shape[0])
    dp_offset, dp_local = local_dp_rows(mesh)

    def shard(batch):
        def build(x, sh):
            x = np.asarray(x)
            if x.shape[0] != dp_local:
                raise ValueError(
                    f"expected {dp_local} local dp rows, got {x.shape[0]} "
                    "(construct the loader with process_index/process_count)")
            gshape = (dp_global,) + x.shape[1:]

            def cb(idx):
                row = idx[0]
                lo = 0 if row.start is None else row.start
                hi = gshape[0] if row.stop is None else row.stop
                return x[lo - dp_offset: hi - dp_offset][
                    (slice(None),) + tuple(idx[1:])]

            return jax.make_array_from_callback(gshape, sh, cb)

        return jax.tree.map(build, batch, shardings)

    return shard
