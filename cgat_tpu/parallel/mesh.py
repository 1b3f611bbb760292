"""Device-mesh construction (TPU-native replacement for the reference's
PyTorch-Lightning DDP/NCCL setup, reference CGAT/train.py:53-76).

The mesh is 2-D: ``dp`` (data parallel — the DDP equivalent; place across
hosts/DCN) x ``edge`` (edge-partitioning within a batch — the GNN analogue of
sequence/context parallelism; place across ICI so boundary-node all-reduces
ride the fast interconnect). jax.distributed multi-host initialisation plugs
in transparently: ``jax.devices()`` then spans the pod slice.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(dp: int | None = None, edge: int = 1, *,
              devices=None) -> Mesh:
    """Build a ('dp', 'edge') mesh.

    ``dp=None`` uses all available devices divided by ``edge``. The ``edge``
    axis is laid out innermost (adjacent device ids) so its collectives map to
    nearest-neighbour ICI links on TPU.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        if n % edge:
            raise ValueError(f"{n} devices not divisible by edge={edge}")
        dp = n // edge
    need = dp * edge
    if need > n:
        raise ValueError(f"need {need} devices, have {n}")
    arr = np.asarray(devices[:need]).reshape(dp, edge)
    return Mesh(arr, ("dp", "edge"))


def maybe_initialize_distributed():
    """Multi-host: initialise jax.distributed when env vars indicate a pod
    slice (no-op on single host). See parallel/distributed.py."""
    from .distributed import maybe_initialize_distributed as _init
    return _init()
