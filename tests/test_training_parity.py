"""Training-trajectory parity: the JAX trainer vs the torch oracle driven by
torch autograd + torch.optim.AdamW on identical data and identical initial
parameters.

Forward-activation parity (test_model_parity.py) pins the model's math;
this file pins the *dynamics*: gradients, AdamW moments, weight decay, and
the damping projected-gradient semantics must all line up for the loss
trajectories to track over tens of steps (north star: matched e_above_hull
MAE — BASELINE.md; reference training loop lightning_module.py:227-259).

Also pins the *structure* with hard-coded shape assertions so the oracle
(which infers depth from the flax param tree) cannot silently inherit a
structural misreading of the reference.
"""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from cgat_tpu.data import collate
from cgat_tpu.data.synthetic import random_graphs, to_oracle_inputs
from cgat_tpu.models import CGATConfig, CGAtNet
from cgat_tpu.training import TrainerConfig, make_optimizer
from cgat_tpu.training.trainer import TrainState, make_train_step
from cgat_tpu.training import losses as L
import torch_oracle as O

SMALL = dict(orig_elem_fea_len=16, elem_fea_len=8, n_graph=2,
             nbr_embedding_size=8, neighbor_number=4, msg_heads=2,
             n_graph_roost=2, out_hidden=(16, 8))


def test_adamw_loss_trajectory_tracks_torch():
    """~50 AdamW steps on one batch: JAX trainer loss == torch-oracle loss
    step for step (rtol 1e-3). Covers grads, moments, decoupled weight
    decay, and the damping clamp dynamics."""
    n_steps, lr, wd = 50, 3e-3, 1e-2
    cfg = CGATConfig(**SMALL)
    graphs = random_graphs(0, 6, n_atoms_range=(3, 6),
                           max_nbr=cfg.neighbor_number,
                           orig_fea=cfg.orig_elem_fea_len)
    batch = collate(graphs, max_nbr=cfg.neighbor_number, node_bucket=8)
    model = CGAtNet(cfg)
    params = model.init(jax.random.key(0), batch)["params"]
    y = np.asarray([g.target for g in graphs], np.float32)

    # --- JAX trajectory
    tcfg = TrainerConfig(optim="AdamW", learning_rate=lr, weight_decay=wd)
    tx = make_optimizer(tcfg)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    step = make_train_step(model, tx, L.make_loss("L1", False), 0.0, 1.0,
                           donate=False)
    jax_losses = []
    for _ in range(n_steps):
        state, m = step(state, batch)
        jax_losses.append(float(m["loss"]))

    # --- torch trajectory through the autograd-capable oracle
    tp = O.torch_params(jax.tree.map(np.asarray, params), requires_grad=True)
    opt = torch.optim.AdamW(O.param_leaves(tp), lr=lr, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=wd)
    oin = to_oracle_inputs(graphs)
    ty = torch.as_tensor(y)
    torch_losses = []
    for _ in range(n_steps):
        opt.zero_grad()
        out = O.cgat_forward(tp, cfg, oin)
        loss = (out[:, 0] - ty).abs().mean()
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

    np.testing.assert_allclose(jax_losses, torch_losses, rtol=1e-3,
                               atol=1e-5)
    # the trajectory must actually move (not a constant-loss fluke)
    assert jax_losses[-1] < jax_losses[0]


def test_param_tree_structure_hardcoded():
    """Structural asserts with EXPECTED shapes derived from the reference
    source, independent of the flax tree (so torch_oracle's tree-driven
    structure inference cannot mirror a misreading):

    - HyperFC: 3 conditioned layers + layer_last
      (H_Net num_hidden_layers=2, Hypernetworksmp.py:267-274)
    - FCBlock inside each HyperLinear: 4 tanh layers + scaled fc_last
      (hyper_num_hidden_layers=3 -> 1+3, Hypernetworksmp.py:36-83)
    - output head dims 640 -> [1024,1024,512,512,256,256,128] -> 2
      (CGAT.py:526-537 with msg_heads=5, atom_fea_len=128)
    - MultiHeadNetwork hidden = int(cat_dim / 1.5) (CGAT.py:91-100)
    """
    cfg = CGATConfig()  # flagship defaults
    graphs = random_graphs(0, 2, n_atoms_range=(3, 5), max_nbr=24)
    batch = collate(graphs, max_nbr=24, node_bucket=8)
    model = CGAtNet(cfg)
    from cgat_tpu.models.host_init import init_params_host
    p = init_params_host(model, batch, seed=0)

    def shape(*path):
        node = p
        for k in path:
            node = node[k]
        return tuple(node.shape)

    # embeddings (CGAT.py:364-366, lightning_module.py:166)
    assert shape("embedding", "kernel") == (200, 128)
    assert shape("nbr_embedding", "embedding") == (25, 128)

    # node MP layer 0: cat = 2*128+128 = 384, hidden = int(384/1.5) = 256,
    # vector attention -> out 128 per head, 5 heads
    assert shape("graph_0_Node", "MH_A", "fc_in_kernel") == (5, 256, 384)
    assert shape("graph_0_Node", "MH_A", "fc_out_kernel") == (5, 128, 256)
    assert shape("graph_0_Node", "MH_M", "fc_out_kernel") == (5, 128, 256)

    # 5 MP layers exactly; layer 0 hypernetwork is H_Net_0 (no damping),
    # layers 1..4 are H_Net (damping present) — CGAT.py:300-305
    for i in range(5):
        assert f"graph_{i}_Node" in p and f"graph_{i}_Edge" in p
    assert "graph_5_Node" not in p
    assert "damping" not in p["graph_0_Node"]["Pooling_NN"]
    for i in range(1, 5):
        assert shape(f"graph_{i}_Node", "Pooling_NN", "damping") == (1,)

    # HyperFC: layer_0..layer_2 + layer_last, no layer_3
    hyper = p["graph_1_Node"]["Pooling_NN"]["Hyper"]
    assert set(hyper) == {"layer_0", "layer_1", "layer_2", "layer_last"}
    # FCBlock in each HyperLinear: fc_0..fc_3 + fc_last; last predicts
    # in*out + out = 128*128 + 128 params from a 128-wide tanh stack
    fcb = hyper["layer_0"]["hypo_params"]
    assert set(fcb) == {f"fc_{i}_{s}" for i in range(4)
                        for s in ("kernel", "bias")} | {"fc_last_kernel",
                                                        "fc_last_bias"}
    assert shape("graph_1_Node", "Pooling_NN", "Hyper", "layer_0",
                 "hypo_params", "fc_last_kernel") == (128, 128 * 128 + 128)

    # dead-branch edge attention params exist (ckpt parity, CGAT.py:224-225)
    assert shape("graph_0_Edge", "MH_A", "fc_in_kernel") == (5, 256, 384)
    # default edge update is SimpleNetwork(edge) 128 -> [128] -> 128
    assert shape("graph_0_Edge", "Pooling_NN", "fc_0", "kernel") == (128, 128)
    assert shape("graph_0_Edge", "Pooling_NN", "fc_out", "kernel") == (128, 128)

    # roost: Linear(200, 127) embed + weight concat (roost_message.py:189),
    # 3 message layers, gate/message pair nets over 2*128 concat
    assert shape("roost", "embedding", "kernel") == (200, 127)
    assert {k for k in p["roost"] if k.startswith("graph_")} == {
        "graph_0", "graph_1", "graph_2"}
    assert shape("roost", "graph_0", "head0_gate_nn", "fc_out",
                 "kernel") == (256, 1)

    # global pool: gate over [fea || crys_fea] = 256-wide input, 5 heads
    assert shape("cry_pool", "MH_A", "fc_in_kernel") == (5, 128, 256)

    # output head: 640 -> hidden dims -> 2, residual projections only where
    # the width changes (message_changed.py:81-138)
    dims = [640, 1024, 1024, 512, 512, 256, 256, 128]
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        assert shape("output_nn", f"fc_{i}", "kernel") == (din, dout)
        if din != dout:
            assert shape("output_nn", f"res_fc_{i}", "kernel") == (din, dout)
        else:
            assert f"res_fc_{i}" not in p["output_nn"]
        assert ("rezero_" + str(i)) in p["output_nn"]  # rezero=True default
    assert shape("output_nn", "fc_out", "kernel") == (128, 2)
    assert "fc_7" not in p["output_nn"]
