"""Golden-activation parity: padded JAX model vs unpadded torch oracle.

This is the build's version of the north-star "per-layer activations allclose
vs the PyTorch CGAT on identical featurized inputs" (BASELINE.md): the oracle
implements the reference semantics on raw edge lists; the JAX model runs on a
padded static batch. Outputs on real (unmasked) slots must agree.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cgat_tpu.data import collate
from cgat_tpu.data.synthetic import random_graphs, to_oracle_inputs
from cgat_tpu.models import CGATConfig, CGAtNet
import torch_oracle as O

SMALL = dict(orig_elem_fea_len=16, elem_fea_len=8, n_graph=2,
             nbr_embedding_size=8, neighbor_number=4, msg_heads=2,
             n_graph_roost=2, out_hidden=(16, 8))


def build(seed=0, n_graphs=3, **overrides):
    cfg = CGATConfig(**{**SMALL, **overrides})
    graphs = random_graphs(seed, n_graphs, n_atoms_range=(3, 7),
                           max_nbr=cfg.neighbor_number,
                           orig_fea=cfg.orig_elem_fea_len)
    batch = collate(graphs, max_nbr=cfg.neighbor_number, node_bucket=8,
                    num_graphs=n_graphs + 1)  # one padded graph slot
    model = CGAtNet(cfg)
    params = model.init(jax.random.key(seed), batch)["params"]
    oracle_in = to_oracle_inputs(graphs)
    return cfg, graphs, batch, model, params, oracle_in


def np_params(params):
    return jax.tree.map(np.asarray, params)


def test_default_config_forward_parity():
    cfg, graphs, batch, model, params, oin = build()
    got = np.asarray(model.apply({"params": params}, batch))
    want = O.cgat_forward(np_params(params), cfg, oin).numpy()
    np.testing.assert_allclose(got[: len(graphs)], want, rtol=2e-4, atol=2e-5)
    assert got.shape == (batch.num_graphs, 2)
    assert np.all(np.isfinite(got))


def test_graph_embedding_parity():
    cfg, graphs, batch, model, params, oin = build(seed=1)
    got = np.asarray(model.apply({"params": params}, batch,
                                 return_graph_embedding=True))
    want = O.cgat_forward(np_params(params), cfg, oin,
                          return_graph_embedding=True).numpy()
    assert got.shape[1] == cfg.embedding_dim
    np.testing.assert_allclose(got[: len(graphs)], want, rtol=2e-4, atol=2e-5)


def test_penultimate_features_parity():
    cfg, graphs, batch, model, params, oin = build(seed=2)
    got = np.asarray(model.apply({"params": params}, batch, last_layer=False))
    want = O.cgat_forward(np_params(params), cfg, oin,
                          last_layer=False).numpy()
    np.testing.assert_allclose(got[: len(graphs)], want, rtol=2e-4, atol=2e-5)


def test_mean_pooling_variant():
    cfg, graphs, batch, model, params, oin = build(seed=3, mean_pooling=True,
                                                   rezero=False)
    got = np.asarray(model.apply({"params": params}, batch))
    want = O.cgat_forward(np_params(params), cfg, oin).numpy()
    np.testing.assert_allclose(got[: len(graphs)], want, rtol=2e-4, atol=2e-5)


def test_hyper_edge_variant():
    """no_hyper=False: live hypernetwork edge updates (CGAT.py:469-511)."""
    cfg, graphs, batch, model, params, oin = build(seed=4, no_hyper=False)
    got = np.asarray(model.apply({"params": params}, batch))
    want = O.cgat_forward(np_params(params), cfg, oin).numpy()
    np.testing.assert_allclose(got[: len(graphs)], want, rtol=2e-4, atol=2e-5)


def test_node_only_variant():
    """update_edges=False: node-only attention stack (sane rebuild of the
    reference's dead branch, CGAT.py:406-425)."""
    cfg, graphs, batch, model, params, oin = build(seed=5, update_edges=False)
    got = np.asarray(model.apply({"params": params}, batch))
    want = O.cgat_forward(np_params(params), cfg, oin).numpy()
    np.testing.assert_allclose(got[: len(graphs)], want, rtol=2e-4, atol=2e-5)


def test_padding_invariance():
    """More padding slots must not change real outputs."""
    cfg, graphs, batch, model, params, _ = build(seed=6)
    big = collate(graphs, max_nbr=cfg.neighbor_number, node_bucket=8,
                  num_graphs=len(graphs) + 5, num_node_slots=96,
                  num_comp_slots=batch.comp_fea.shape[1] + 3)
    out_small = np.asarray(model.apply({"params": params}, batch))
    out_big = np.asarray(model.apply({"params": params}, big))
    np.testing.assert_allclose(out_small[: len(graphs)],
                               out_big[: len(graphs)], rtol=1e-5, atol=1e-6)


def test_gradients_finite():
    cfg, graphs, batch, model, params, _ = build(seed=7)

    def loss_fn(p):
        out = model.apply({"params": p}, batch)
        pred = out[:, 0]
        return jnp.sum(jnp.where(batch.graph_mask,
                                 jnp.abs(pred - batch.target), 0.0))

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(g)) for g in leaves)
    # at least the embedding must receive signal
    assert np.abs(np.asarray(grads["embedding"]["kernel"])).max() > 0


def test_per_layer_activation_parity():
    """Per-layer golden activations (the north-star's 'per-layer activations
    allclose' check, BASELINE.md): every GATConvNodes/GATConvEdges output and
    the roost/pool features must match the oracle layer by layer."""
    import torch
    cfg, graphs, batch, model, params, oin = build(seed=11)
    _, inter = model.apply({"params": params}, batch,
                           capture_intermediates=True, mutable=["intermediates"])
    inter = inter["intermediates"]

    # oracle layer-by-layer replay
    npp = np_params(params)
    x = O.t(oin["nodes"]) @ O.t(npp["embedding"]["kernel"])
    emb = O.t(npp["nbr_embedding"]["embedding"])
    e = emb[O.ti(oin["edge_shell"])]
    src, dst = O.ti(oin["edge_src"]), O.ti(oin["edge_dst"])
    x0, e0 = x.clone(), e.clone()
    n_real_nodes = oin["nodes"].shape[0]
    n_real_edges = oin["edge_src"].shape[0]
    # the batch builder sorts edges by destination (stable); per-edge
    # activations compare through that permutation
    perm = np.argsort(oin["edge_dst"], kind="stable")
    for i in range(cfg.n_graph):
        node_up = O.gat_conv_nodes(npp[f"graph_{i}_Node"], x, src, dst, e,
                                   x0, cfg.elem_fea_len, first=(i == 0))
        got_node = np.asarray(
            inter[f"graph_{i}_Node"]["__call__"][0])[:n_real_nodes]
        np.testing.assert_allclose(got_node, node_up.numpy(),
                                   rtol=5e-4, atol=5e-5,
                                   err_msg=f"node layer {i}")
        e_up = O.gat_conv_edges(npp[f"graph_{i}_Edge"], x, src, dst, e, e0,
                                cfg.nbr_embedding_size, first=(i == 0),
                                no_hyper=cfg.no_hyper,
                                vector_attention=cfg.vector_attention)
        got_edge = np.asarray(
            inter[f"graph_{i}_Edge"]["__call__"][0])[:n_real_edges]
        np.testing.assert_allclose(got_edge, e_up.numpy()[perm],
                                   rtol=5e-4, atol=5e-5,
                                   err_msg=f"edge layer {i}")
        e = e + e_up
        x = x + node_up

    crys = O.roost_forward(npp["roost"], O.t(oin["comp_weights"]),
                           O.t(oin["comp_fea"]), O.ti(oin["comp_self_idx"]),
                           O.ti(oin["comp_nbr_idx"]), O.ti(oin["comp_cry_idx"]))
    got_roost = np.asarray(inter["roost"]["__call__"][0])[: crys.shape[0]]
    np.testing.assert_allclose(got_roost, crys.numpy(), rtol=5e-4, atol=5e-5,
                               err_msg="roost")
    pool = O.mh_attention(npp["cry_pool"], x, crys, O.ti(oin["node2graph"]),
                          cfg.msg_heads, cfg.elem_fea_len)
    got_pool = np.asarray(inter["cry_pool"]["__call__"][0])[: pool.shape[0]]
    np.testing.assert_allclose(got_pool, pool.numpy(), rtol=5e-4, atol=5e-5,
                               err_msg="cry_pool")


def test_hyper_remat_is_equivalent():
    """`hyper_remat` must change memory behavior only: same params tree,
    identical forward, and bit-identical gradients (remat recomputes the
    same ops in the same order)."""
    cfg, graphs, batch, model, params, _ = build(seed=3)
    cfg_r = CGATConfig(**{**SMALL, "hyper_remat": True})
    model_r = CGAtNet(cfg_r)
    params_r = model_r.init(jax.random.key(3), batch)["params"]
    chex = jax.tree.structure(params) == jax.tree.structure(params_r)
    assert chex, "remat must not alter the parameter tree"

    def loss(m, p):
        return jnp.mean(m.apply({"params": p}, batch) ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(model, p))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(model_r, p))(params)
    assert float(l0) == float(l1)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), g0, g1)


def test_split_projection_is_equivalent():
    """`split_projection` must be a pure compute-layout change: identical
    parameter tree and matching outputs/gradients (exact linear
    decomposition of the MH fc_in; only float summation order differs)."""
    cfg, graphs, batch, model, params, _ = build(seed=8)
    cfg_s = CGATConfig(**{**SMALL, "split_projection": True})
    model_s = CGAtNet(cfg_s)
    params_s = model_s.init(jax.random.key(8), batch)["params"]
    assert jax.tree.structure(params) == jax.tree.structure(params_s)

    out = np.asarray(model.apply({"params": params}, batch))
    out_s = np.asarray(model_s.apply({"params": params}, batch))
    np.testing.assert_allclose(out_s, out, rtol=2e-4, atol=2e-5)

    def loss(m, p):
        return jnp.mean(m.apply({"params": p}, batch) ** 2)

    g0 = jax.grad(lambda p: loss(model, p))(params)
    g1 = jax.grad(lambda p: loss(model_s, p))(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-6)
