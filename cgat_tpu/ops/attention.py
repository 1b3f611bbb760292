"""Fused edge-attention aggregation ops (SDDMM/segment-softmax/SpMM analogue).

The reference expresses node message passing through PyG's
``MessagePassing.propagate`` (gather -> score -> segment softmax -> dropout ->
weighted scatter-add; reference CGAT/CGAT.py:307-335). Here the same dataflow
is a single functional op over static-shape edge arrays, with an XLA path and
an optional fused Pallas TPU kernel (``cgat_tpu.ops.pallas``).

Layout: per-edge score ``alpha`` and message ``m`` are ``(E, H, F)``;
``edge_dst`` is the aggregation segment id (sorted); output is ``(N, H, F)``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import segment as seg

_BACKEND = "xla"  # module-level default; "pallas" enables fused kernels


def set_backend(name: str) -> None:
    global _BACKEND
    if name not in ("xla", "pallas"):
        raise ValueError(f"unknown attention backend {name!r}")
    _BACKEND = name


def get_backend() -> str:
    return _BACKEND


def edge_softmax_aggregate(alpha, m, edge_dst, num_nodes, *, edge_mask=None,
                           offn=None, backend=None):
    """softmax(alpha over dst-segments) * m, scatter-added to nodes.

    Equivalent to the reference's ``softmax(alpha, edge_index_i)`` followed by
    ``scatter_add`` aggregation with ``aggr='add'`` (CGAT/CGAT.py:319-326).

    Args:
      alpha: (E, H, F) raw attention scores (vector attention) or (E, H, 1).
      m: (E, H, F) messages.
      edge_dst: (E,) int32 destination node per edge, sorted ascending.
      num_nodes: static number of node slots.
      edge_mask: (E,) bool validity; padded edges contribute nothing.
      offn: optional host-precomputed unclamped CSR pointers over
        ``edge_dst`` (Pallas path only; ignored by the XLA path).

    Returns:
      (num_nodes, H, F) aggregated messages.
    """
    backend = backend or _BACKEND
    if backend == "pallas":
        from .pallas import edge_softmax_aggregate as _pallas_impl
        return _pallas_impl(alpha, m, edge_dst, num_nodes, edge_mask=edge_mask,
                            offn=offn)
    weights = seg.segment_softmax(alpha, edge_dst, num_nodes, mask=edge_mask)
    weighted = weights * m
    if edge_mask is not None:
        weighted = jnp.where(edge_mask[:, None, None], weighted, 0.0)
    return seg.segment_sum(weighted, edge_dst, num_nodes)


def edge_softmax_aggregate_pair(alpha_l, m_l, dst_l, mask_l,
                                alpha_h, m_h, dst_h, mask_h, num_nodes, *,
                                offn_l=None, offn_h=None, backend=None):
    """Fused aggregation over a LOCAL-src + HALO-src edge block pair.

    Mathematically identical to :func:`edge_softmax_aggregate` on the
    concatenated blocks — the softmax normalises over every edge incident at
    a destination node across both blocks — but keeps the blocks separate so
    the local block's per-edge matmuls carry no data dependence on the halo
    ``all_to_all`` (comm/compute overlap, SURVEY.md section 5.7). Both blocks
    must be dst-sorted; on the Pallas path each block additionally needs a
    False-suffix mask (the per-shard collate layout).
    """
    backend = backend or _BACKEND
    if backend == "pallas":
        from .pallas import edge_softmax_aggregate_pair as _pallas_impl
        return _pallas_impl(alpha_l, m_l, dst_l, mask_l,
                            alpha_h, m_h, dst_h, mask_h, num_nodes,
                            offn_l=offn_l, offn_h=offn_h)
    w_l, w_h = seg.segment_softmax_pair(alpha_l, dst_l, mask_l,
                                        alpha_h, dst_h, mask_h, num_nodes)
    agg_l = seg.segment_sum(
        jnp.where(mask_l[:, None, None], w_l * m_l, 0.0), dst_l, num_nodes)
    agg_h = seg.segment_sum(
        jnp.where(mask_h[:, None, None], w_h * m_h, 0.0), dst_h, num_nodes)
    return agg_l + agg_h


def headnorm_attention(alpha, m, *, out_channels, vector_attention, edge_mask=None):
    """GATConvEdges' head-normalised attention (reference CGAT/CGAT.py:212-223).

    NOT a segment softmax: ``alpha.exp()`` then normalise across the head axis
    only, then ``(m * alpha).mean(heads)``. Kept for the live ``no_hyper=False``
    hypernetwork edge path; under defaults the reference overwrites this value
    (CGAT/CGAT.py:224-225) so callers may skip it entirely.
    """
    alpha = jnp.exp(alpha)
    if not vector_attention:
        denom = alpha.sum(axis=1, keepdims=True)          # (E,1,1)
    else:
        denom = alpha.sum(axis=1, keepdims=True)          # (E,1,F)
    alpha = alpha / denom
    out = (m * alpha).mean(axis=1)
    if edge_mask is not None:
        out = jnp.where(edge_mask[:, None], out, 0.0)
    return out
