"""CSR segment-sum kernel + fast-backward gather (ops/gather.py) vs the
plain XLA scatter-add semantics (interpret mode on CPU; same code compiles
with Mosaic on TPU — certified per-round by bench.py verify_production)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cgat_tpu.ops.pallas.segment_sum import csr_segment_sum
from cgat_tpu.ops.gather import gather_rows
from cgat_tpu.ops import attention as _att


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_csr_segment_sum_matches_scatter(rng, dtype):
    """Oracle accumulates in f32 (the kernel's semantics — the MXU one-hot
    contraction f32-accumulates bf16 inputs; XLA's bf16 scatter-add rounds
    after EVERY add and is strictly noisier)."""
    n, e_real, e_tot = 48, 700, 1024
    ids = np.sort(rng.integers(0, n, size=e_real)).astype(np.int32)
    ids = np.concatenate([ids, np.full(e_tot - e_real, n - 1, np.int32)])
    vals = rng.standard_normal((e_tot, 128)).astype(np.float32)
    v = jnp.asarray(vals, dtype)
    got = np.asarray(csr_segment_sum(v, jnp.asarray(ids), n,
                                     out_dtype=jnp.float32, interpret=True))
    want = np.asarray(jnp.zeros((n, 128), jnp.float32).at[jnp.asarray(ids)]
                      .add(v.astype(jnp.float32)))
    tol = 1e-5
    np.testing.assert_allclose(got, want, rtol=tol, atol=tol)


def test_csr_segment_sum_n_real_excludes_padding(rng):
    n, e_real, e_tot = 32, 500, 768
    ids = np.sort(rng.integers(0, n, size=e_real)).astype(np.int32)
    ids = np.concatenate([ids, np.full(e_tot - e_real, n - 1, np.int32)])
    vals = jnp.asarray(rng.standard_normal((e_tot, 128)), jnp.float32)
    got = np.asarray(csr_segment_sum(vals, jnp.asarray(ids), n,
                                     n_real=e_real, interpret=True))
    want = np.asarray(jnp.zeros((n, 128)).at[jnp.asarray(ids[:e_real])]
                      .add(vals[:e_real]))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_csr_segment_sum_odd_block_split(rng):
    """Row count not a multiple of the block size exercises the clamped
    last-chunk DMA window (no padding chunk in the kernel)."""
    n, e_tot = 16, 400
    ids = np.sort(rng.integers(0, n, size=e_tot)).astype(np.int32)
    vals = jnp.asarray(rng.standard_normal((e_tot, 128)), jnp.float32)
    got = np.asarray(csr_segment_sum(vals, jnp.asarray(ids), n,
                                     block_rows=96, interpret=True))
    want = np.asarray(jnp.zeros((n, 128)).at[jnp.asarray(ids)].add(vals))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("mode", ["sorted", "perm"])
def test_gather_rows_grads_match_indexing(rng, mode):
    """gather_rows forward == table[idx]; backward (CSR segment sum on the
    pallas backend) == the autodiff scatter of plain indexing."""
    n, e = 40, 512
    table = jnp.asarray(rng.standard_normal((n, 128)), jnp.float32)
    if mode == "sorted":
        idx = jnp.asarray(np.sort(rng.integers(0, n, size=e)).astype(np.int32))
        kw = dict(ids_sorted=True)
    else:
        idx = jnp.asarray(rng.integers(0, n, size=e).astype(np.int32))
        kw = dict(perm=jnp.asarray(np.argsort(np.asarray(idx),
                                              kind="stable").astype(np.int32)))
    cot = jnp.asarray(rng.standard_normal((e, 128)), jnp.float32)

    def loss(fn):
        return lambda t: jnp.sum(fn(t) * cot)

    prev = _att.get_backend()
    _att.set_backend("pallas")
    try:
        v_p, g_p = jax.value_and_grad(loss(
            lambda t: gather_rows(t, idx, **kw)))(table)
    finally:
        _att.set_backend(prev)
    v_x, g_x = jax.value_and_grad(loss(lambda t: t[idx]))(table)
    assert np.isclose(float(v_p), float(v_x), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=1e-5, atol=1e-5)


def test_gather_rows_fallback_without_layout():
    """No sortedness and no perm -> plain indexing (still differentiable)."""
    table = jnp.arange(12.0).reshape(4, 3)
    idx = jnp.asarray([2, 0, 1], jnp.int32)
    out = gather_rows(table, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(table[idx]))


def test_collate_ships_src_perm(rng):
    from cgat_tpu.data import collate
    from cgat_tpu.data.synthetic import random_graphs
    graphs = random_graphs(0, 4, n_atoms_range=(4, 8), max_nbr=6)
    batch = collate(graphs, max_nbr=6, node_bucket=16)
    perm = np.asarray(batch.edge_src_perm)
    src = np.asarray(batch.edge_src)
    assert perm.shape == src.shape
    sorted_src = src[perm]
    assert (np.diff(sorted_src) >= 0).all()
    assert np.array_equal(np.sort(perm), np.arange(src.shape[0]))


def test_gather_plan_grads_match_indexing(rng):
    """The GatherPlan path — precomputed sidx/inv/offn shared across layers,
    the call form CGAtNet actually uses on the pallas backend — against
    plain-indexing autodiff, mirroring the model's dst (sorted) + src
    (permuted) pattern in one differentiated function (r4 advisor: a
    swapped dst/src plan would silently corrupt gradients)."""
    from cgat_tpu.ops.gather import GatherPlan
    n, e = 40, 512
    table = jnp.asarray(rng.standard_normal((n, 128)), jnp.float32)
    dst = jnp.asarray(np.sort(rng.integers(0, n, size=e)).astype(np.int32))
    src = jnp.asarray(rng.integers(0, n, size=e).astype(np.int32))
    perm = jnp.asarray(np.argsort(np.asarray(src),
                                  kind="stable").astype(np.int32))
    cot = jnp.asarray(rng.standard_normal((e, 256)), jnp.float32)

    prev = _att.get_backend()
    _att.set_backend("pallas")
    try:
        dst_plan = GatherPlan.build(dst, n)
        src_plan = GatherPlan.build(src, n, perm=perm)

        def loss_planned(t):
            cat = jnp.concatenate(
                [gather_rows(t, dst, ids_sorted=True, plan=dst_plan),
                 gather_rows(t, src, perm=perm, plan=src_plan)], axis=-1)
            return jnp.sum(cat * cot)

        v_p, g_p = jax.value_and_grad(loss_planned)(table)
    finally:
        _att.set_backend(prev)

    def loss_plain(t):
        return jnp.sum(jnp.concatenate([t[dst], t[src]], axis=-1) * cot)

    v_x, g_x = jax.value_and_grad(loss_plain)(table)
    assert np.isclose(float(v_p), float(v_x), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=1e-5, atol=1e-5)


def test_collate_ships_per_shard_src_perm(rng):
    """Edge-sharded collates ship a PER-SHARD argsort with block-local
    values: each shard's slice of the perm sorts its own local-src block."""
    from cgat_tpu.data import collate
    from cgat_tpu.data.synthetic import random_graphs
    S = 4
    graphs = random_graphs(3, 6, n_atoms_range=(3, 6), max_nbr=4,
                           orig_fea=12)
    b = collate(graphs, max_nbr=4, node_bucket=8, edge_shards=S)
    perm = np.asarray(b.edge_src_perm)
    src = np.asarray(b.edge_src)
    cap = src.shape[0] // S
    for s in range(S):
        blk = slice(s * cap, (s + 1) * cap)
        p, sr = perm[blk], src[blk]
        assert np.array_equal(np.sort(p), np.arange(cap))   # block-local
        assert (np.diff(sr[p]) >= 0).all()                  # sorts the block
