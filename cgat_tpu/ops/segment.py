"""Segment (scatter/gather) primitives for crystal-graph message passing.

These are the TPU-native equivalents of the reference's torch_scatter /
torch_geometric native kernels (reference: CGAT/CGAT.py:6-9, scatter_add /
scatter_max / torch_geometric.utils.softmax). The XLA path here lowers to
sorted-segment scatters that TPU handles well; a fused Pallas path lives in
``cgat_tpu.ops.pallas`` and is dispatched via :func:`use_pallas`.

Conventions
-----------
* All segment ids are ``int32`` and refer to a statically known number of
  segments (``num_segments``) so shapes stay static under ``jit``.
* Padding is expressed with boolean masks; masked entries contribute exactly
  zero to every reduction (including softmax denominators).
* Edge arrays are sorted by destination segment at batch-build time, so
  ``indices_are_sorted=True`` can be used throughout.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Large-but-finite negative used instead of -inf so fully masked segments
# produce 0 rather than NaN after max-subtraction.
NEG_BIG = -1e30
SOFTMAX_EPS = 1e-16  # matches torch_geometric.utils.softmax denominator eps


def segment_sum(data, segment_ids, num_segments, *, indices_are_sorted=True):
    """Sum ``data`` rows into ``num_segments`` buckets."""
    return jax.ops.segment_sum(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )


def segment_max(data, segment_ids, num_segments, *, indices_are_sorted=True):
    """Max-reduce ``data`` rows into ``num_segments`` buckets.

    Empty segments yield the dtype minimum (callers mask afterwards).
    """
    return jax.ops.segment_max(
        data, segment_ids, num_segments, indices_are_sorted=indices_are_sorted
    )


def segment_mean(data, segment_ids, num_segments, *, mask=None,
                 indices_are_sorted=True):
    """Mean-reduce with optional validity mask (torch_scatter.scatter_mean)."""
    if mask is not None:
        data = jnp.where(_expand(mask, data), data, 0.0)
        ones = mask.astype(data.dtype)
    else:
        ones = jnp.ones(data.shape[0], data.dtype)
    total = segment_sum(data, segment_ids, num_segments,
                        indices_are_sorted=indices_are_sorted)
    count = segment_sum(ones, segment_ids, num_segments,
                        indices_are_sorted=indices_are_sorted)
    return total / jnp.maximum(count.reshape(count.shape + (1,) * (total.ndim - count.ndim)), 1.0)


def _expand(mask, data):
    """Broadcast a 1-D mask over trailing dims of ``data``."""
    return mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim))


def segment_softmax(scores, segment_ids, num_segments, *, mask=None,
                    indices_are_sorted=True, eps=SOFTMAX_EPS):
    """Numerically stable segment softmax (torch_geometric.utils.softmax).

    ``scores`` has shape ``(M, ...)``; softmax is taken independently for every
    trailing position, normalising over all rows sharing a segment id
    (reference semantics: softmax(alpha, edge_index_i), CGAT/CGAT.py:323).

    Padded rows (``mask == False``) get weight exactly 0; fully padded
    segments produce all-zero weights instead of NaN.
    """
    if mask is not None:
        scores = jnp.where(_expand(mask, scores), scores, NEG_BIG)
    seg_max = segment_max(scores, segment_ids, num_segments,
                          indices_are_sorted=indices_are_sorted)
    seg_max = jnp.maximum(seg_max, NEG_BIG)  # empty segments -> finite
    shifted = scores - seg_max[segment_ids]
    unnorm = jnp.exp(shifted)
    if mask is not None:
        unnorm = jnp.where(_expand(mask, unnorm), unnorm, 0.0)
    denom = segment_sum(unnorm, segment_ids, num_segments,
                        indices_are_sorted=indices_are_sorted)
    return unnorm / (denom[segment_ids] + eps)


def segment_softmax_pair(scores_a, ids_a, mask_a, scores_b, ids_b, mask_b,
                         num_segments, *, indices_are_sorted=True,
                         eps=SOFTMAX_EPS):
    """Segment softmax over the UNION of two edge blocks.

    The edge-partitioned layout stores each shard's edges as a local-src
    block and a halo-src block (cgat_tpu.data.batching) so the local block's
    matmuls can overlap the boundary ``all_to_all``; the softmax still
    normalises over every edge incident at a destination node, across both
    blocks. Returns the normalised weights of each block ``(w_a, w_b)`` —
    numerically identical (shift-invariance) to :func:`segment_softmax` on
    the concatenated blocks.
    """
    sa = jnp.where(_expand(mask_a, scores_a), scores_a, NEG_BIG)
    sb = jnp.where(_expand(mask_b, scores_b), scores_b, NEG_BIG)
    mx = jnp.maximum(
        segment_max(sa, ids_a, num_segments,
                    indices_are_sorted=indices_are_sorted),
        segment_max(sb, ids_b, num_segments,
                    indices_are_sorted=indices_are_sorted))
    mx = jnp.maximum(mx, NEG_BIG)
    # exponentiate the MASKED scores (sa/sb): masked rows sit at NEG_BIG so
    # the shifted exponent stays <= 0 — exponentiating the raw scores would
    # put inf in the untaken where-branch and NaN the gradient
    ea = jnp.where(_expand(mask_a, sa), jnp.exp(sa - mx[ids_a]), 0.0)
    eb = jnp.where(_expand(mask_b, sb), jnp.exp(sb - mx[ids_b]), 0.0)
    den = (segment_sum(ea, ids_a, num_segments,
                       indices_are_sorted=indices_are_sorted)
           + segment_sum(eb, ids_b, num_segments,
                         indices_are_sorted=indices_are_sorted))
    return ea / (den[ids_a] + eps), eb / (den[ids_b] + eps)


def weighted_segment_softmax(scores, weights, pow_, segment_ids, num_segments,
                             *, mask=None, indices_are_sorted=True, eps=1e-13):
    """Roost's WeightedAttention gate (reference roost_message.py:302-311).

    gate = (w ** pow) * exp(score - segment_max(score));
    gate = gate / (segment_sum(gate) + 1e-13)

    ``weights`` broadcasts against ``scores`` (shape ``(M,)`` or ``(M, 1)``).
    """
    if mask is not None:
        scores = jnp.where(_expand(mask, scores), scores, NEG_BIG)
    seg_max = segment_max(scores, segment_ids, num_segments,
                          indices_are_sorted=indices_are_sorted)
    seg_max = jnp.maximum(seg_max, NEG_BIG)
    gate = jnp.exp(scores - seg_max[segment_ids])
    if weights.ndim < scores.ndim:
        weights = weights.reshape(weights.shape + (1,) * (scores.ndim - weights.ndim))
    gate = (weights ** pow_) * gate
    if mask is not None:
        gate = jnp.where(_expand(mask, gate), gate, 0.0)
    denom = segment_sum(gate, segment_ids, num_segments,
                        indices_are_sorted=indices_are_sorted)
    return gate / (denom[segment_ids] + eps)


@functools.partial(jax.jit, static_argnames=("num_segments",))
def segment_count(mask, segment_ids, num_segments):
    """Number of valid rows per segment."""
    return segment_sum(mask.astype(jnp.int32), segment_ids, num_segments)
