"""Segment ops vs naive loop references (SURVEY.md section 4 test plan)."""
import numpy as np
import jax.numpy as jnp

from cgat_tpu.ops import segment as seg


def naive_segment_softmax(scores, ids, n, mask=None, eps=1e-16):
    out = np.zeros_like(scores)
    for s in range(n):
        sel = ids == s
        if mask is not None:
            sel = sel & mask
        if sel.any():
            sub = scores[sel]
            sub = np.exp(sub - sub.max(axis=0, keepdims=True))
            out[sel] = sub / (sub.sum(axis=0, keepdims=True) + eps)
    return out


def test_segment_sum_sorted(rng):
    ids = np.sort(rng.integers(0, 7, size=40)).astype(np.int32)
    x = rng.standard_normal((40, 5)).astype(np.float32)
    got = seg.segment_sum(jnp.asarray(x), jnp.asarray(ids), 7)
    want = np.zeros((7, 5), np.float32)
    for i, s in enumerate(ids):
        want[s] += x[i]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_segment_softmax_matches_naive(rng):
    ids = np.sort(rng.integers(0, 6, size=50)).astype(np.int32)
    x = rng.standard_normal((50, 3, 4)).astype(np.float32) * 3
    got = seg.segment_softmax(jnp.asarray(x), jnp.asarray(ids), 6)
    want = naive_segment_softmax(x, ids, 6)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_segment_softmax_masked_and_empty(rng):
    # segment 2 fully masked, segment 5 empty
    ids = np.sort(np.concatenate([rng.integers(0, 5, size=30), [2, 2]])
                  ).astype(np.int32)
    mask = ids != 2
    x = rng.standard_normal((32, 2)).astype(np.float32)
    got = np.asarray(seg.segment_softmax(jnp.asarray(x), jnp.asarray(ids), 6,
                                         mask=jnp.asarray(mask)))
    want = naive_segment_softmax(x, ids, 6, mask=mask)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert np.all(got[~mask] == 0)
    assert np.all(np.isfinite(got))


def test_weighted_segment_softmax(rng):
    ids = np.sort(rng.integers(0, 4, size=20)).astype(np.int32)
    x = rng.standard_normal((20, 1)).astype(np.float32)
    w = rng.random((20, 1)).astype(np.float32) + 0.1
    pow_ = 0.7
    got = np.asarray(seg.weighted_segment_softmax(
        jnp.asarray(x), jnp.asarray(w), pow_, jnp.asarray(ids), 4))
    want = np.zeros_like(x)
    for s in range(4):
        m = ids == s
        if m.any():
            sub = np.exp(x[m] - x[m].max(axis=0, keepdims=True))
            sub = (w[m] ** pow_) * sub
            want[m] = sub / (sub.sum(axis=0, keepdims=True) + 1e-13)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_segment_mean_masked(rng):
    ids = np.sort(rng.integers(0, 3, size=12)).astype(np.int32)
    x = rng.standard_normal((12, 2)).astype(np.float32)
    mask = rng.random(12) > 0.3
    got = np.asarray(seg.segment_mean(jnp.asarray(x), jnp.asarray(ids), 3,
                                      mask=jnp.asarray(mask)))
    for s in range(3):
        m = (ids == s) & mask
        if m.any():
            np.testing.assert_allclose(got[s], x[m].mean(axis=0),
                                       rtol=1e-5, atol=1e-6)
