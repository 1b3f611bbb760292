"""Full-model forward/grad with the Pallas backend (interpret mode) vs XLA."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cgat_tpu.data import collate
from cgat_tpu.data.synthetic import random_graphs
from cgat_tpu.models import CGATConfig, CGAtNet
from cgat_tpu.ops import attention as att
from cgat_tpu.ops.pallas import segment_attention as sa


@pytest.fixture
def pallas_interpret():
    old_backend, old_interp = att.get_backend(), sa.INTERPRET
    att.set_backend("pallas")
    sa.INTERPRET = True
    yield
    att.set_backend(old_backend)
    sa.INTERPRET = old_interp


def test_model_forward_and_grad_with_pallas_backend(pallas_interpret):
    # elem_fea_len 128 so HF = heads*128 is lane-aligned (pallas-eligible)
    cfg = CGATConfig(orig_elem_fea_len=16, elem_fea_len=128, n_graph=1,
                     nbr_embedding_size=16, neighbor_number=4, msg_heads=2,
                     n_graph_roost=1, out_hidden=(16,))
    graphs = random_graphs(0, 3, n_atoms_range=(3, 6), max_nbr=4, orig_fea=16)
    batch = collate(graphs, max_nbr=4, node_bucket=8)
    model = CGAtNet(cfg)
    params = model.init(jax.random.key(0), batch)["params"]

    out_p = np.asarray(model.apply({"params": params}, batch))
    att.set_backend("xla")
    out_x = np.asarray(model.apply({"params": params}, batch))
    att.set_backend("pallas")
    np.testing.assert_allclose(out_p, out_x, rtol=2e-4, atol=1e-5)

    def loss(p, backend):
        att.set_backend(backend)
        o = model.apply({"params": p}, batch)
        return jnp.mean(jnp.where(batch.graph_mask,
                                  jnp.abs(o[:, 0] - batch.target), 0.0))

    g_p = jax.grad(lambda p: loss(p, "pallas"))(params)
    g_x = jax.grad(lambda p: loss(p, "xla"))(params)
    for a, b in zip(jax.tree.leaves(g_p), jax.tree.leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5)


def test_host_offsets_match_device_and_model_invariant(pallas_interpret):
    """Host-precomputed CSR pointers (collate ships edge_dst_offn /
    edge_src_offn / edge_src_sorted / node2graph_offn) must (a) equal the
    device searchsorted after the consumer's n_real clamp and (b) leave the
    model's loss and gradients BIT-identical to the device-computed path,
    on both backends (round-5: removes three binary-search while-loops
    from the step)."""
    from cgat_tpu.ops.pallas.segment_attention import _node_offsets

    cfg = CGATConfig(orig_elem_fea_len=16, elem_fea_len=128, n_graph=1,
                     nbr_embedding_size=16, neighbor_number=4, msg_heads=2,
                     n_graph_roost=1, out_hidden=(16,))
    graphs = random_graphs(1, 3, n_atoms_range=(3, 6), max_nbr=4, orig_fea=16)
    batch = collate(graphs, max_nbr=4, node_bucket=8)

    n_real = int(np.sum(np.asarray(batch.edge_mask)))
    for n_hi in (3, batch.num_node_slots, batch.num_node_slots + 40):
        dev = np.asarray(_node_offsets(batch.edge_dst,
                                       jnp.int32(n_real), n_hi))
        host = np.minimum(np.asarray(batch.edge_dst_offn[:n_hi + 1]), n_real)
        np.testing.assert_array_equal(dev, host)
    np.testing.assert_array_equal(
        np.asarray(batch.edge_src_sorted),
        np.asarray(batch.edge_src)[np.asarray(batch.edge_src_perm)])

    model = CGAtNet(cfg)
    params = model.init(jax.random.key(1), batch)["params"]
    stripped = batch.replace(edge_dst_offn=None, edge_src_offn=None,
                             edge_src_sorted=None, node2graph_offn=None)

    def loss(p, b):
        o = model.apply({"params": p}, b)
        return jnp.mean(jnp.where(b.graph_mask,
                                  jnp.abs(o[:, 0] - b.target), 0.0))

    for backend in ("pallas", "xla"):
        att.set_backend(backend)
        l1, g1 = jax.value_and_grad(loss)(params, batch)
        l2, g2 = jax.value_and_grad(loss)(params, stripped)
        assert float(l1) == float(l2)
        for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_embed_lookup_matmul_backward():
    """embed_lookup == table[ids] in both directions (the backward is a
    one-hot MXU matmul instead of the serialized XLA scatter-add)."""
    from cgat_tpu.ops.gather import embed_lookup

    rng = np.random.default_rng(7)
    table = jnp.asarray(rng.standard_normal((25, 128)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 25, 200).astype(np.int32))
    g = jnp.asarray(rng.standard_normal((200, 128)).astype(np.float32))

    out, vjp = jax.vjp(lambda t: embed_lookup(t, ids), table)
    out_ref, vjp_ref = jax.vjp(lambda t: t[ids], table)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_ref))
    np.testing.assert_allclose(np.asarray(vjp(g)[0]),
                               np.asarray(vjp_ref(g)[0]),
                               rtol=1e-6, atol=1e-6)


def test_no_searchsorted_in_step_with_host_offsets(pallas_interpret):
    """With the collate's host CSR pointers present, the traced fwd+grad
    contains NO searchsorted (the binary-search scan XLA cannot CSE,
    ~0.5 ms/step on v5e); stripping the pointers brings it back — proving
    the offsets actually replace the device computation rather than
    duplicating it."""
    cfg = CGATConfig(orig_elem_fea_len=16, elem_fea_len=128, n_graph=1,
                     nbr_embedding_size=16, neighbor_number=4, msg_heads=2,
                     n_graph_roost=1, out_hidden=(16,))
    graphs = random_graphs(2, 3, n_atoms_range=(3, 6), max_nbr=4, orig_fea=16)
    batch = collate(graphs, max_nbr=4, node_bucket=8)
    model = CGAtNet(cfg)
    params = model.init(jax.random.key(0), batch)["params"]

    def loss(p, b):
        o = model.apply({"params": p}, b)
        return jnp.mean(jnp.where(b.graph_mask,
                                  jnp.abs(o[:, 0] - b.target), 0.0))

    with_offn = str(jax.make_jaxpr(jax.grad(loss))(params, batch))
    stripped = batch.replace(edge_dst_offn=None, edge_src_offn=None,
                             edge_src_sorted=None, node2graph_offn=None)
    without = str(jax.make_jaxpr(jax.grad(loss))(params, stripped))
    assert "searchsorted" not in with_offn
    assert "searchsorted" in without
