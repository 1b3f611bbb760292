"""Node-table gather whose BACKWARD is TPU-native.

``x[edge_index]`` gathers are free on TPU, but their autodiff transpose is
a scatter-add that XLA lowers to a serialized update loop — measured ~65 us
per (8448, 128) -> (768, 128) scatter on v5e, ~8x off the HBM bound, twice
per message-passing layer (round-4 step trace; reference analog: the
torch_scatter backward of PyG's propagate, CGAT/CGAT.py:319-326).

The batch layout already guarantees ``edge_dst`` is sorted, and collate
ships ``edge_src_perm`` (the stable argsort of ``edge_src``), so both
scatters can instead run as CSR one-hot membership matmuls on the MXU
(ops/pallas/segment_sum.py):

    d_table = csr_segment_sum(g[perm], ids[perm])   # perm = identity for dst

Semantics are identical to the XLA scatter-add, padding included: padded
edges point at the last node slot and their (zero) cotangents sum there in
both formulations. Engaged when the global op backend is "pallas" and the
feature width is a lane multiple; otherwise plain ``table[idx]`` autodiff.

:class:`GatherPlan` precomputes the CSR row pointers (a device
searchsorted) and the permuted ids ONCE per step — the flagship gathers
through the same two index arrays in all five layers, and XLA does not CSE
the searchsorted while-loops (measured ~0.5 ms/step of redundant offset
recomputation, round-4 trace).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class GatherPlan:
    """Reusable backward plan for one index array: sorted ids, gather
    permutation (None when already sorted) and CSR row pointers."""
    sidx: jnp.ndarray
    inv: jnp.ndarray | None
    offn: jnp.ndarray

    @staticmethod
    def build(idx, num_segments: int, *, perm=None, n_real=None,
              sidx=None, offn=None):
        """``sidx``/``offn``: host-precomputed sorted ids and UNCLAMPED CSR
        pointers (``CrystalBatch.edge_src_sorted`` / ``*_offn``) — skips
        the per-step device sort-gather and searchsorted while-loop. offn
        may be longer than needed; the required prefix is sliced here.
        Unclamped equals :func:`plan_offsets`'s default nr=len(ids) clamp
        because every pointer is <= len(ids) by construction."""
        from .pallas.segment_sum import BLOCK_NODES, plan_offsets
        idx = idx.astype(jnp.int32)
        inv = None if perm is None else perm.astype(jnp.int32)
        if sidx is None:
            sidx = idx if inv is None else jnp.take(idx, inv)
        else:
            sidx = sidx.astype(jnp.int32)
        if offn is not None and n_real is None:
            n_pad = -(-num_segments // BLOCK_NODES) * BLOCK_NODES
            if offn.shape[0] >= n_pad + 1:
                return GatherPlan(sidx, inv,
                                  offn[:n_pad + 1].astype(jnp.int32))
        return GatherPlan(sidx, inv,
                          plan_offsets(sidx, num_segments, n_real=n_real))


jax.tree_util.register_pytree_node(
    GatherPlan,
    lambda p: ((p.sidx, p.inv, p.offn), None),
    lambda _, ch: GatherPlan(*ch))


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _gather_csr(table, idx, sidx, inv, offn):
    """table[idx] with a CSR segment-sum backward.

    sidx: ``idx`` pre-sorted ascending; inv: permutation with
    ``idx[inv] == sidx`` (identity when ``idx`` is already sorted);
    offn: CSR row pointers from :func:`plan_offsets` (or None to compute
    in the backward)."""
    return table[idx]


def _gather_fwd(table, idx, sidx, inv, offn):
    return table[idx], (idx, sidx, inv, offn, table.shape[0])


def _gather_bwd(res, g):
    from .pallas.segment_sum import csr_segment_sum
    idx, sidx, inv, offn, n = res
    gs = g if inv is None else jnp.take(g, inv, axis=0)
    dt = csr_segment_sum(gs, sidx, n, offn=offn, out_dtype=g.dtype)
    return dt, None, None, None, None


_gather_csr.defvjp(_gather_fwd, _gather_bwd)


@jax.custom_vjp
def embed_lookup(table, ids):
    """``table[ids]`` for a SMALL embedding table whose BACKWARD is a
    one-hot matmul instead of an XLA scatter-add.

    The autodiff transpose of a table gather is a scatter-add that XLA
    serializes per row — ~60 us for the (8448,) shell-index lookup into the
    (25, 128) neighbor-embedding table (round-5 step trace; reference
    analog: the ``nbr_embedding`` backward, CGAT/CGAT.py:364,566). With a
    table this small the same sum is one (T, E) x (E, F) MXU matmul against
    the one-hot membership matrix — microseconds, and f32-accumulated
    (the XLA scatter accumulates in the gradient dtype). Unsorted ids are
    fine; no CSR needed."""
    return table[ids]


def _embed_fwd(table, ids):
    # zero-size proxy keeps the primal's shape[0]/dtype in the residuals
    # without holding the table itself
    return table[ids], (ids, jnp.zeros((table.shape[0], 0), table.dtype))


def _embed_bwd(res, g):
    ids, proxy = res
    t = proxy.shape[0]
    oh = (ids[:, None] == jnp.arange(t, dtype=ids.dtype)[None, :])
    dt = jax.lax.dot_general(
        oh.astype(g.dtype), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return dt.astype(proxy.dtype), None


embed_lookup.defvjp(_embed_fwd, _embed_bwd)


def gather_rows(table, idx, *, perm=None, ids_sorted=False, plan=None):
    """``table[idx]`` with the fast backward when the layout allows it.

    ``ids_sorted``: ``idx`` is non-decreasing (the dst layout invariant).
    ``perm``: stable argsort of ``idx`` (the collate-provided
    ``edge_src_perm``). ``plan``: a precomputed :class:`GatherPlan` for
    ``idx`` (shares the CSR searchsorted across layers). With none of
    these, plain autodiff applies."""
    from . import attention as _att
    f = table.shape[-1]
    eligible = (_att.get_backend() == "pallas" and table.ndim == 2
                and f % 128 == 0
                and (plan is not None or ids_sorted or perm is not None))
    if not eligible:
        return table[idx]
    if plan is not None:
        return _gather_csr(table, idx, plan.sidx, plan.inv, plan.offn)
    if ids_sorted:
        inv = None          # backward consumes g as-is
        sidx = idx
    else:
        inv = perm.astype(jnp.int32)
        sidx = jnp.take(idx, inv)
    return _gather_csr(table, idx, sidx, inv, None)
