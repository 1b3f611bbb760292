"""Fused MultiHead-network kernel (ops/pallas/mh_network.py) vs the einsum
path (interpret mode on CPU; Mosaic numerics certified per-round on
hardware by bench.py verify_production)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cgat_tpu.models.blocks import LEAKY_SLOPE
from cgat_tpu.ops.pallas.mh_network import _block_rows, mh_network, supported


def _einsum_ref(x, w_in, b_in, w_out, b_out):
    """The models/blocks.py einsum formulation, flattened head-major."""
    h = jnp.einsum("bi,hji->bhj", x, w_in) + b_in
    h = jnp.where(h > 0, h, LEAKY_SLOPE * h)
    y = jnp.einsum("bhj,hoj->bho", h, w_out) + b_out
    return y.reshape(x.shape[0], -1)


def make(rng, e=1024, cat=384, hid=256, f=128, heads=5, dtype=jnp.bfloat16):
    x = jnp.asarray(rng.standard_normal((e, cat)), dtype)
    w_in = jnp.asarray(rng.standard_normal((heads, hid, cat)) * 0.05, dtype)
    b_in = jnp.asarray(rng.standard_normal((heads, hid)) * 0.05, dtype)
    w_out = jnp.asarray(rng.standard_normal((heads, f, hid)) * 0.05, dtype)
    b_out = jnp.asarray(rng.standard_normal((heads, f)) * 0.05, dtype)
    return x, w_in, b_in, w_out, b_out


def _flat_args(w_in, b_in, w_out, b_out):
    cat = w_in.shape[2]
    f = w_out.shape[1]
    win = w_in.transpose(2, 0, 1).reshape(cat, -1)
    wout = w_out.transpose(0, 2, 1).reshape(-1, f)
    return win, b_in.reshape(-1), wout, b_out.reshape(-1)


def test_forward_matches_einsum(rng):
    x, w_in, b_in, w_out, b_out = make(rng)
    win, bi, wout, bo = _flat_args(w_in, b_in, w_out, b_out)
    got = np.asarray(mh_network(x, win, bi, wout, bo, heads=5, hid=256,
                                f=128, interpret=True), np.float32)
    want = np.asarray(_einsum_ref(x, w_in, b_in, w_out, b_out), np.float32)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=2e-2 * scale)


def test_forward_f32_rejected():
    assert not supported(384, 256, 128, 5, jnp.float32)
    assert supported(384, 256, 128, 5, jnp.bfloat16)
    assert _block_rows(8448) == 768
    assert _block_rows(997) is None


def test_grads_match_einsum(rng):
    x, w_in, b_in, w_out, b_out = make(rng, e=512)
    win, bi, wout, bo = _flat_args(w_in, b_in, w_out, b_out)
    cot = jnp.asarray(rng.standard_normal((512, 640)), jnp.bfloat16)

    def loss_fused(x, win, bi, wout, bo):
        return jnp.sum((mh_network(x, win, bi, wout, bo, heads=5, hid=256,
                                   f=128, interpret=True)
                        * cot).astype(jnp.float32))

    def loss_ref(x, w_in, b_in, w_out, b_out):
        return jnp.sum((_einsum_ref(x, w_in, b_in, w_out, b_out)
                        * cot).astype(jnp.float32))

    v_f, g_f = jax.value_and_grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
        x, win, bi, wout, bo)
    v_r, g_r = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        x, w_in, b_in, w_out, b_out)
    assert np.isclose(float(v_f), float(v_r), rtol=2e-2)
    # re-layout the reference grads into the kernel's flat shapes
    r_win, r_bi, r_wout, r_bo = _flat_args(*g_r[1:])
    for a, b in zip(g_f, (g_r[0], r_win, r_bi, r_wout, r_bo)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = np.linalg.norm(b) + 1e-6
        assert np.linalg.norm(a - b) / denom < 5e-2, \
            (a.shape, np.abs(a - b).max())


def test_model_flat_path_matches_einsum_path(rng):
    """Full CGAtNet with flagship-like MH dims in bf16: backend pallas
    (fused MH + flat attention engaged) vs backend xla."""
    from cgat_tpu.data import collate
    from cgat_tpu.data.synthetic import random_graphs
    from cgat_tpu.models import CGATConfig, CGAtNet
    from cgat_tpu.models.host_init import init_params_host
    from cgat_tpu.ops import attention as att

    cfg = CGATConfig(orig_elem_fea_len=16, elem_fea_len=128, n_graph=2,
                     nbr_embedding_size=128, neighbor_number=16, msg_heads=5,
                     n_graph_roost=1, out_hidden=(16,),
                     compute_dtype="bfloat16")
    graphs = random_graphs(0, 6, n_atoms_range=(5, 9), max_nbr=16,
                           orig_fea=16)
    batch = collate(graphs, max_nbr=16, node_bucket=8)
    assert _block_rows(batch.num_edge_slots) is not None  # fused-eligible
    model = CGAtNet(cfg)
    params = init_params_host(model, batch, seed=0)

    old = att.get_backend()
    try:
        att.set_backend("pallas")
        # the fused MH kernel must actually engage on this config
        jaxpr = str(jax.make_jaxpr(
            lambda p: model.apply({"params": p}, batch))(params))
        assert "mh_net_fwd" in jaxpr
        out_p = np.asarray(model.apply({"params": params}, batch), np.float32)
        att.set_backend("xla")
        out_x = np.asarray(model.apply({"params": params}, batch), np.float32)
    finally:
        att.set_backend(old)
    assert np.isfinite(out_p).all()
    np.testing.assert_allclose(out_p, out_x, rtol=5e-2,
                               atol=5e-2 * (np.abs(out_x).max() + 1e-3))
