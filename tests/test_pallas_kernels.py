"""Pallas fused segment-attention kernel vs XLA reference (interpret mode on
CPU; the same code compiles with Mosaic on TPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cgat_tpu.ops.attention import edge_softmax_aggregate as xla_op
from cgat_tpu.ops.pallas.segment_attention import (
    edge_softmax_aggregate as pallas_op,
)


def make_problem(rng, n_nodes=64, n_real_edges=900, e_tot=1024, h=2, f=128):
    dst = np.sort(rng.integers(0, n_nodes, size=n_real_edges)).astype(np.int32)
    dst = np.concatenate([dst, np.full(e_tot - n_real_edges, n_nodes - 1,
                                       np.int32)])
    mask = np.zeros(e_tot, bool)
    mask[:n_real_edges] = True
    alpha = rng.standard_normal((e_tot, h, f)).astype(np.float32) * 2
    m = rng.standard_normal((e_tot, h, f)).astype(np.float32)
    return (jnp.asarray(alpha), jnp.asarray(m), jnp.asarray(dst),
            jnp.asarray(mask), n_nodes)


def test_forward_matches_xla(rng):
    alpha, m, dst, mask, n = make_problem(rng)
    want = np.asarray(xla_op(alpha, m, dst, n, edge_mask=mask))
    got = np.asarray(pallas_op(alpha, m, dst, n, edge_mask=mask,
                               block_nodes=8, block_edges=256,
                               interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_forward_no_mask(rng):
    alpha, m, dst, mask, n = make_problem(rng, n_real_edges=1024)
    want = np.asarray(xla_op(alpha, m, dst, n))
    got = np.asarray(pallas_op(alpha, m, dst, n, block_nodes=8,
                               block_edges=256, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_empty_and_hub_nodes(rng):
    """Some nodes with zero edges, one hub node with hundreds."""
    n_nodes = 32
    dst = np.concatenate([np.zeros(400, np.int32),
                          np.full(300, 7, np.int32),
                          np.sort(rng.integers(16, 31, size=324))]).astype(np.int32)
    e_tot = 1024
    alpha = rng.standard_normal((e_tot, 1, 128)).astype(np.float32)
    m = rng.standard_normal((e_tot, 1, 128)).astype(np.float32)
    want = np.asarray(xla_op(jnp.asarray(alpha), jnp.asarray(m),
                             jnp.asarray(dst), n_nodes))
    got = np.asarray(pallas_op(jnp.asarray(alpha), jnp.asarray(m),
                               jnp.asarray(dst), n_nodes, block_nodes=8,
                               block_edges=256, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # nodes 8..15 have no edges -> exactly zero
    np.testing.assert_array_equal(got[8:16], 0.0)


def test_gradients_match_xla(rng):
    alpha, m, dst, mask, n = make_problem(rng, n_real_edges=700)

    def loss_x(a, mm):
        return jnp.sum(xla_op(a, mm, dst, n, edge_mask=mask) ** 2)

    def loss_p(a, mm):
        return jnp.sum(pallas_op(a, mm, dst, n, edge_mask=mask,
                                 block_nodes=8, block_edges=256,
                                 interpret=True) ** 2)

    gx = jax.grad(loss_x, argnums=(0, 1))(alpha, m)
    gp = jax.grad(loss_p, argnums=(0, 1))(alpha, m)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_scalar_attention_falls_back(rng):
    """F=1 uses the XLA path transparently."""
    e_tot, h = 256, 4
    dst = np.sort(rng.integers(0, 16, size=e_tot)).astype(np.int32)
    alpha = jnp.asarray(rng.standard_normal((e_tot, h, 1)), jnp.float32)
    m = jnp.asarray(rng.standard_normal((e_tot, h, 8)), jnp.float32)
    got = pallas_op(alpha, m, jnp.asarray(dst), 16, interpret=True)
    want = xla_op(alpha, m, jnp.asarray(dst), 16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_backward_block_policy_and_grads(rng):
    """The backward derives its own (smaller) edge block from the forward's:
    halve while > 128, i.e. 768 -> 96 (measured knee on v5e, see
    segment_attention._vjp_bwd). Gradients must match XLA at the default
    production block sizes for edge counts that are / are not multiples of
    the forward block."""
    from cgat_tpu.ops.pallas import segment_attention as sa

    # policy: 768 -> 96, 512 -> 128, 256 -> 256 (cannot halve below divisor)
    for fwd_be, e_tot, want in ((768, 768 * 4, 96), (512, 512, 128),
                                (256, 256, 128)):
        be = fwd_be
        if sa.BWD_BLOCK_EDGES and e_tot % sa.BWD_BLOCK_EDGES == 0:
            be = sa.BWD_BLOCK_EDGES
        else:
            while be > 128 and e_tot % (be // 2) == 0:
                be //= 2
        assert be == want, (fwd_be, e_tot, be)

    # grads at the production defaults (block_edges=768 -> bwd 96) on an
    # edge count that is NOT a multiple of 768 (wrapper pads it up)
    alpha, m, dst, mask, n = make_problem(rng, n_nodes=64, n_real_edges=700,
                                          e_tot=800, h=2, f=128)

    def loss(op):
        def f(a, mm):
            out = op(a, mm, dst, n, edge_mask=mask)
            return jnp.sum(out * jnp.arange(out.size, dtype=out.dtype
                                            ).reshape(out.shape))
        return f

    want = jax.grad(loss(lambda *a, **k: xla_op(*a, **k)),
                    argnums=(0, 1))(alpha, m)
    got = jax.grad(loss(lambda *a, **k: pallas_op(*a, interpret=True, **k)),
                   argnums=(0, 1))(alpha, m)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-3, atol=1e-3)


def test_bf16_mode_gradients_and_dtypes(rng):
    """bf16 compute mode: the kernel contracts and ships cotangents in bf16
    (HBM-bound traffic halving, docs/PERFORMANCE.md roofline). Cotangents
    must come back bf16 (matching the primal dtype) and stay within the
    bf16 noise floor of the XLA bf16 path — including the exp-shift error
    from the bf16-rounded running max (bounded by |max| * 2^-8)."""
    alpha, m, dst, mask, n = make_problem(rng, n_real_edges=700)
    alpha = (alpha * 1.5).astype(jnp.bfloat16)   # realistic logit spread
    m = m.astype(jnp.bfloat16)

    def loss_x(a, mm):
        return jnp.sum(xla_op(a, mm, dst, n, edge_mask=mask
                              ).astype(jnp.float32) ** 2)

    def loss_p(a, mm):
        return jnp.sum(pallas_op(a, mm, dst, n, edge_mask=mask,
                                 block_nodes=8, block_edges=256,
                                 interpret=True).astype(jnp.float32) ** 2)

    fx = np.asarray(xla_op(alpha, m, dst, n, edge_mask=mask), np.float32)
    fp = np.asarray(pallas_op(alpha, m, dst, n, edge_mask=mask,
                              block_nodes=8, block_edges=256,
                              interpret=True), np.float32)
    assert np.linalg.norm(fp - fx) / np.linalg.norm(fx) < 0.02

    gx = jax.grad(loss_x, argnums=(0, 1))(alpha, m)
    gp = jax.grad(loss_p, argnums=(0, 1))(alpha, m)
    for a, b in zip(gp, gx):
        assert a.dtype == jnp.bfloat16
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        assert np.linalg.norm(a - b) / np.linalg.norm(b) < 0.03


def test_hyper_apply_fused_matches_xla(rng):
    """Fused hypernetwork predict+apply (ops/pallas/hyper_apply.py) vs the
    XLA reference at the gated dims (C=I=O=128), including a B that is not
    a block multiple (exercises the pad/slice path) and grads on all four
    inputs."""
    from cgat_tpu.ops.pallas.hyper_apply import hyper_apply

    C = I = O = 128
    F = O * I + O
    for B in (96, 100):
        h = jnp.asarray(rng.standard_normal((B, C)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((C, F)) * 0.05, jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((F,)) * 0.05, jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((B, I)), jnp.bfloat16)

        def ref(h, k, b, x):
            p = h @ k + b
            w = p[:, :O * I].reshape(-1, O, I)
            return jnp.einsum("boi,bi->bo", w, x) + p[:, O * I:]

        def fused(h, k, b, x):
            return hyper_apply(h, k, b, x, out_ch=O, interpret=True)

        fr = np.asarray(ref(h, k, b, x), np.float32)
        ff = np.asarray(fused(h, k, b, x), np.float32)
        assert np.linalg.norm(ff - fr) / np.linalg.norm(fr) < 2e-2

        def loss(f):
            return lambda *a: jnp.sum(f(*a).astype(jnp.float32) ** 2)

        gr = jax.grad(loss(ref), argnums=(0, 1, 2, 3))(h, k, b, x)
        gf = jax.grad(loss(fused), argnums=(0, 1, 2, 3))(h, k, b, x)
        for a, w in zip(gf, gr):
            a = np.asarray(a, np.float32)
            w = np.asarray(w, np.float32)
            assert np.linalg.norm(a - w) / (np.linalg.norm(w) + 1e-30) < 3e-2


# ---------------------------------------------------------------------------
# local/halo edge-block PAIR op (halo-overlap layout)
# ---------------------------------------------------------------------------

def make_pair_problem(rng, n_nodes=64, n_l=700, e_l=768, n_h=90, e_h=128,
                      h=2, f=128, dtype=np.float32):
    """Two dst-sorted, suffix-masked edge blocks over the same node set."""
    def block(n_real, e_tot):
        dst = np.sort(rng.integers(0, n_nodes, size=n_real)).astype(np.int32)
        dst = np.concatenate([dst, np.full(e_tot - n_real, n_nodes - 1,
                                           np.int32)])
        mask = np.zeros(e_tot, bool)
        mask[:n_real] = True
        alpha = rng.standard_normal((e_tot, h, f)).astype(dtype) * 2
        m = rng.standard_normal((e_tot, h, f)).astype(dtype)
        return (jnp.asarray(alpha), jnp.asarray(m), jnp.asarray(dst),
                jnp.asarray(mask))
    return block(n_l, e_l), block(n_h, e_h), n_nodes


def _union_oracle(lb, hb, n):
    """Single-array op on the concatenated blocks (mask-aware, unsorted ok
    on the XLA path via explicit masking and two-pass softmax)."""
    from cgat_tpu.ops import segment as seg
    alpha = jnp.concatenate([lb[0], hb[0]])
    m = jnp.concatenate([lb[1], hb[1]])
    dst = jnp.concatenate([lb[2], hb[2]])
    mask = jnp.concatenate([lb[3], hb[3]])
    w = seg.segment_softmax(alpha, dst, n, mask=mask,
                            indices_are_sorted=False)
    return seg.segment_sum(jnp.where(mask[:, None, None], w * m, 0.0), dst,
                           n, indices_are_sorted=False)


def test_pair_xla_matches_union(rng):
    from cgat_tpu.ops.attention import edge_softmax_aggregate_pair
    lb, hb, n = make_pair_problem(rng)
    want = np.asarray(_union_oracle(lb, hb, n))
    got = np.asarray(edge_softmax_aggregate_pair(*lb, *hb, n, backend="xla"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pair_pallas_matches_union(rng):
    from cgat_tpu.ops.pallas import edge_softmax_aggregate_pair as pallas_pair
    lb, hb, n = make_pair_problem(rng)
    want = np.asarray(_union_oracle(lb, hb, n))
    got = np.asarray(pallas_pair(*lb, *hb, n, block_nodes=8, block_edges=256,
                                 interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pair_pallas_gradients(rng):
    from cgat_tpu.ops.pallas import edge_softmax_aggregate_pair as pallas_pair
    lb, hb, n = make_pair_problem(rng, n_l=500, n_h=60)

    def loss_o(al, ml, ah, mh_):
        return jnp.sum(_union_oracle((al, ml, lb[2], lb[3]),
                                     (ah, mh_, hb[2], hb[3]), n) ** 2)

    def loss_p(al, ml, ah, mh_):
        return jnp.sum(pallas_pair(al, ml, lb[2], lb[3], ah, mh_, hb[2],
                                   hb[3], n, block_nodes=8, block_edges=256,
                                   interpret=True) ** 2)

    go = jax.grad(loss_o, argnums=(0, 1, 2, 3))(lb[0], lb[1], hb[0], hb[1])
    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(lb[0], lb[1], hb[0], hb[1])
    for a, b in zip(gp, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-5)


def test_pair_tiny_halo_block(rng):
    """Halo blocks are often tiny (a few boundary edges) — exercise the
    small-block padding path, including an entirely-empty halo block."""
    from cgat_tpu.ops.pallas import edge_softmax_aggregate_pair as pallas_pair
    lb, hb, n = make_pair_problem(rng, n_l=250, e_l=256, n_h=5, e_h=16)
    want = np.asarray(_union_oracle(lb, hb, n))
    got = np.asarray(pallas_pair(*lb, *hb, n, block_nodes=8, block_edges=256,
                                 interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # empty halo block == plain single-array op
    hb0 = (hb[0], hb[1], hb[2], jnp.zeros_like(hb[3]))
    got0 = np.asarray(pallas_pair(*lb, *hb0, n, block_nodes=8,
                                  block_edges=256, interpret=True))
    want0 = np.asarray(xla_op(lb[0], lb[1], lb[2], n, edge_mask=lb[3]))
    np.testing.assert_allclose(got0, want0, rtol=1e-5, atol=1e-5)


def test_pair_bf16_mode(rng):
    from cgat_tpu.ops.pallas import edge_softmax_aggregate_pair as pallas_pair
    lb, hb, n = make_pair_problem(rng, dtype=np.float32)
    want = np.asarray(_union_oracle(lb, hb, n))
    cast = lambda b: (b[0].astype(jnp.bfloat16), b[1].astype(jnp.bfloat16),
                      b[2], b[3])
    lb16, hb16 = cast(lb), cast(hb)
    got = pallas_pair(*lb16, *hb16, n, block_nodes=8, block_edges=256,
                      interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               rtol=0.05, atol=0.05)
    # gradients flow and carry the io dtype
    g = jax.grad(lambda a: jnp.sum(
        pallas_pair(a, lb16[1], lb16[2], lb16[3], *hb16, n, block_nodes=8,
                    block_edges=256, interpret=True).astype(jnp.float32) ** 2
    ))(lb16[0])
    assert g.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(g, np.float32)).all()


def test_pair_flat_matches_union(rng):
    """The 2D (head-major flat) pair entry — the layout the edge-sharded
    shard_map step feeds it (local block from the fused MH kernel, halo
    block a reshaped einsum result) — against the union oracle, forward
    and gradients, f32 tight."""
    from cgat_tpu.ops.pallas.segment_attention import (
        edge_softmax_aggregate_pair_flat as pair_flat)
    lb, hb, n = make_pair_problem(rng, n_l=500, n_h=60)
    e_l, h, f = lb[0].shape
    e_h = hb[0].shape[0]
    flat = lambda a: a.reshape(a.shape[0], -1)
    want = np.asarray(_union_oracle(lb, hb, n)).reshape(n, h * f)
    got = np.asarray(pair_flat(flat(lb[0]), flat(lb[1]), lb[2], lb[3],
                               flat(hb[0]), flat(hb[1]), hb[2], hb[3], n,
                               block_nodes=8, block_edges=256,
                               interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def loss_o(al, ml, ah, mh_):
        return jnp.sum(_union_oracle((al, ml, lb[2], lb[3]),
                                     (ah, mh_, hb[2], hb[3]), n) ** 2)

    def loss_p(al, ml, ah, mh_):
        out = pair_flat(flat(al), flat(ml), lb[2], lb[3], flat(ah),
                        flat(mh_), hb[2], hb[3], n, block_nodes=8,
                        block_edges=256, interpret=True)
        return jnp.sum(out ** 2)

    go = jax.grad(loss_o, argnums=(0, 1, 2, 3))(lb[0], lb[1], hb[0], hb[1])
    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(lb[0], lb[1], hb[0], hb[1])
    for a, b in zip(gp, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-5)
