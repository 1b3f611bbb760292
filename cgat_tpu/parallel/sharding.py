"""Sharding layouts for stacked crystal batches.

Data parallelism uses a *stacked* batch: D per-replica CrystalBatches stacked
on a new leading axis, sharded over the ``dp`` mesh axis — each replica's
nodes/edges/graphs live wholly on its device (no cross-device edges), the
exact analogue of the reference's per-GPU DDP batches
(lightning_module.py:468-473). Edge arrays are additionally sharded over the
``edge`` axis (edge partitioning within a replica); node arrays stay
replicated across ``edge`` so gathers are local and XLA inserts the
all-reduce for edge->node scatter aggregation.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.batching import CrystalBatch

# fields whose axis 1 (after stacking) is the edge axis
_EDGE_FIELDS = ("edge_src", "edge_dst", "edge_shell", "edge_mask")
# fields whose axis 1 is the node axis (sharded over `edge` in the
# shard_map path: each edge shard owns the node slice its edges point at)
_NODE_FIELDS = ("nodes", "node_mask", "node2graph")
# halo structure: present only on edge-sharded batches (None otherwise),
# axis 1 partitioned over `edge` like the edge arrays (the halo_* arrays are
# the per-shard HALO-src edge blocks; the primary edge arrays hold the
# LOCAL-src blocks)
_HALO_FIELDS = ("halo_src", "halo_dst", "halo_shell", "halo_mask",
                "halo_src_ext", "halo_send_idx")
# host-precomputed CSR pointer arrays (+ pre-sorted src ids). Layout
# mirrors edge_src_perm: global arrays from single-shard collates,
# per-shard shard-major arrays (sharded over `edge`) from edge-sharded
# collates; halo_dst_offn and node2graph_offn exist only on one side each
_OFFN_FIELDS = ("edge_dst_offn", "edge_src_offn", "edge_src_sorted")


def stack_batches(batches) -> CrystalBatch:
    """Stack D same-shape CrystalBatches on a new leading axis.

    Host-side numpy: the stacked batch must stay uncommitted so the batch
    sharder can place (or, multi-process, globalise) it without a bounce
    through the default device."""
    def stack(*xs):
        return np.stack([np.asarray(x) for x in xs])
    return jax.tree.map(stack, *batches)


def batch_pspecs(edge_sharded: bool = True) -> CrystalBatch:
    """PartitionSpecs for a stacked batch (GSPMD-annotation path; such
    batches are plain collates without the halo structure)."""
    def spec_for(name):
        if name in _HALO_FIELDS:
            return None
        if (name == "edge_src_perm" or name in _OFFN_FIELDS
                or name in ("node2graph_offn", "halo_dst_offn")):
            # collate ships these only for single-shard layouts (the fast
            # gather backward / host CSR pointers); None under edge sharding
            return None if (edge_sharded or name == "halo_dst_offn") \
                else P("dp")
        if edge_sharded and name in _EDGE_FIELDS:
            return P("dp", "edge")
        return P("dp")
    fields = {name: spec_for(name) for name in CrystalBatch.__dataclass_fields__}
    return CrystalBatch(**fields)


def shardmap_batch_pspecs(edge_sharded: bool = True) -> CrystalBatch:
    """PartitionSpecs for the shard_map train/eval step: node AND edge
    arrays partitioned over ``edge`` (the batch must be collated with
    ``edge_shards`` so each edge block's destinations live in the matching
    node slice); composition/target arrays replicated across ``edge``."""
    def spec_for(name):
        if name in _HALO_FIELDS:
            return P("dp", "edge") if edge_sharded else None
        if name == "edge_src_perm":
            # edge-sharded collates ship a PER-SHARD argsort with block-local
            # values (data/batching.py), so it shards over `edge` like the
            # local edge block it permutes
            return P("dp", "edge") if edge_sharded else P("dp")
        if name in _OFFN_FIELDS or name == "halo_dst_offn":
            # edge-sharded collates ship per-shard shard-major arrays that
            # shard over `edge` like the blocks they describe; single-shard
            # layouts ship global arrays (halo_dst_offn absent)
            if edge_sharded:
                return P("dp", "edge")
            return None if name == "halo_dst_offn" else P("dp")
        if name == "node2graph_offn":
            return None if edge_sharded else P("dp")
        if edge_sharded and name in _EDGE_FIELDS + _NODE_FIELDS:
            return P("dp", "edge")
        return P("dp")
    fields = {name: spec_for(name) for name in CrystalBatch.__dataclass_fields__}
    return CrystalBatch(**fields)


def batch_shardings(mesh: Mesh, edge_sharded: bool = True) -> CrystalBatch:
    specs = batch_pspecs(edge_sharded)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_stacked_batch(batch: CrystalBatch, mesh: Mesh,
                        edge_sharded: bool = True) -> CrystalBatch:
    sh = batch_shardings(mesh, edge_sharded)
    return jax.tree.map(jax.device_put, batch, sh)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params / train state) over the mesh.

    Multi-process: every process must hold the same host values (same init
    seed); each fills its local copies via ``make_array_from_callback`` —
    no cross-host transfer."""
    s = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, s), tree)

    def rep(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, s, lambda idx, _x=x: _x[idx])

    return jax.tree.map(rep, tree)
