"""Reference-checkpoint importer: key mapping, layout transforms, CLI load.

Builds a plain-torch module tree whose ``state_dict()`` keys EXACTLY match
the reference CGAtNet's (CGAT.py:359-537, Hypernetworksmp.py:24-313,
roost_message.py:88-321, message_changed.py:31-138 — PyG is only needed for
the reference's forward, not its parameter structure), then checks:

* strict import: every tensor consumed, every flax leaf filled;
* layout transforms: grouped-Conv1d MultiHeadNetwork and Linear/FCBlock
  outputs match the flax blocks run on the imported weights;
* association: spot tensors land at the right layer (no cross-wiring);
* ``import_checkpoint`` produces a run dir that ``load_trainer`` loads and
  the model forwards finitely from.
"""
import numpy as np
import pytest
import torch
import torch.nn as nn

from cgat_tpu.tools.import_torch import (config_from_hparams,
                                         import_checkpoint,
                                         params_from_state_dict)


# ------------------------- reference-structure modules (naming parity) ----

class RefMultiHead(nn.Module):                       # CGAT.py:65-112
    def __init__(self, input_dim, output_dim, hidden, heads):
        super().__init__()
        self.input_dim, self.nb_heads, self.output_dim = (input_dim, heads,
                                                          output_dim)
        self.fc_in = nn.Conv1d(input_dim * heads, hidden * heads, 1,
                               groups=heads)
        self.acts = nn.LeakyReLU()
        self.fc_out = nn.Conv1d(hidden * heads, output_dim * heads, 1,
                                groups=heads)

    def forward(self, fea):
        fea = self.acts(self.fc_in(
            fea.reshape(-1, self.input_dim, 1).repeat(1, self.nb_heads, 1)))
        return self.fc_out(fea).view(-1, self.nb_heads, self.output_dim)


class RefSimple(nn.Module):                          # message_changed.py:31-66
    def __init__(self, input_dim, output_dim, hidden):
        super().__init__()
        dims = [input_dim] + hidden
        self.fcs = nn.ModuleList(nn.Linear(dims[i], dims[i + 1])
                                 for i in range(len(dims) - 1))
        self.fc_out = nn.Linear(dims[-1], output_dim)

    def forward(self, x):
        for fc in self.fcs:
            x = nn.functional.leaky_relu(fc(x))
        return self.fc_out(x)


class RefFCLayer(nn.Module):                         # Hypernetworksmp.py:24-33
    def __init__(self, i, o):
        super().__init__()
        self.net = nn.Sequential(nn.Linear(i, o), nn.Tanh())

    def forward(self, x):
        return self.net(x)


class RefFCBlock(nn.Module):                         # Hypernetworksmp.py:36-83
    def __init__(self, hidden_ch, num_hidden, in_f, out_f):
        super().__init__()
        net = [RefFCLayer(in_f, hidden_ch)]
        net += [RefFCLayer(hidden_ch, hidden_ch) for _ in range(num_hidden)]
        net.append(nn.Linear(hidden_ch, out_f))      # outermost_linear=True
        self.net = nn.Sequential(*net)

    def forward(self, x):
        return self.net(x)


class RefHyperLinear(nn.Module):                     # Hypernetworksmp.py:224-254
    def __init__(self, in_ch, out_ch, h_in, h_n, h_ch):
        super().__init__()
        self.hypo_params = RefFCBlock(h_ch, h_n, h_in,
                                      in_ch * out_ch + out_ch)


class RefHyperLayer(nn.Module):                      # Hypernetworksmp.py:86-114
    def __init__(self, in_ch, out_ch, h_in, h_n, h_ch):
        super().__init__()
        self.hyper_linear = RefHyperLinear(in_ch, out_ch, h_in, h_n, h_ch)


class RefHyperFC(nn.Module):                         # Hypernetworksmp.py:117-185
    def __init__(self, h_in, h_n, h_ch, hidden_ch, num_hidden, in_ch, out_ch):
        super().__init__()
        self.layers = nn.ModuleList([RefHyperLayer(in_ch, hidden_ch,
                                                   h_in, h_n, h_ch)])
        self.layers.extend(RefHyperLayer(hidden_ch, hidden_ch, h_in, h_n, h_ch)
                           for _ in range(num_hidden))
        self.layers.append(RefHyperLinear(hidden_ch, out_ch, h_in, h_n, h_ch))


class RefHNet0(nn.Module):                           # Hypernetworksmp.py:257-285
    def __init__(self, c):
        super().__init__()
        self.Hyper = RefHyperFC(c, 3, c, c, 2, c, c)


class RefHNet(nn.Module):                            # Hypernetworksmp.py:288-313
    def __init__(self, c):
        super().__init__()
        self.Hyper = RefHyperFC(c, 3, c, c, 2, c, c)
        self.damping = nn.Parameter(torch.rand(1))


class RefGATNode(nn.Module):                         # CGAT.py:233-335
    def __init__(self, f, fe, heads, first):
        super().__init__()
        cat = 2 * f + fe
        self.MH_A = RefMultiHead(cat, f, int(cat / 1.5), heads)
        self.MH_M = RefMultiHead(cat, f, int(cat / 1.5), heads)
        self.Pooling_NN = RefHNet0(f) if first else RefHNet(f)


class RefGATEdge(nn.Module):                         # CGAT.py:115-230, no_hyper
    def __init__(self, f, fe, heads):
        super().__init__()
        cat = 2 * f + fe
        self.MH_A = RefMultiHead(cat, fe, int(cat / 1.5), heads)
        self.MH_M = RefMultiHead(cat, fe, int(cat / 1.5), heads)
        self.Pooling_NN = RefSimple(fe, fe, [fe])


class RefRezero(nn.Module):                          # message_changed.py:69-78
    def __init__(self):
        super().__init__()
        self.alpha = nn.Parameter(torch.zeros(1))


class RefResidual(nn.Module):                        # message_changed.py:81-138
    def __init__(self, input_dim, output_dim, hidden, if_rezero=True):
        super().__init__()
        dims = [input_dim] + hidden
        self.fcs = nn.ModuleList(nn.Linear(dims[i], dims[i + 1])
                                 for i in range(len(dims) - 1))
        self.res_fcs = nn.ModuleList(
            nn.Linear(dims[i], dims[i + 1], bias=False)
            if dims[i] != dims[i + 1] else nn.Identity()
            for i in range(len(dims) - 1))
        self.fc_out = nn.Linear(dims[-1], output_dim)
        if if_rezero:
            self.rezeros = nn.ModuleList(RefRezero()
                                         for _ in range(len(dims) - 1))


class RefWeightedAttention(nn.Module):               # roost_message.py:286-321
    def __init__(self, gate_nn, message_nn):
        super().__init__()
        self.gate_nn = gate_nn
        self.message_nn = message_nn
        self.pow = nn.Parameter(torch.randn(1))


class RefMessageLayer(nn.Module):                    # roost_message.py:88-156
    def __init__(self, f):
        super().__init__()
        self.pooling = nn.ModuleList([RefWeightedAttention(
            RefSimple(2 * f, 1, [256]), RefSimple(2 * f, f, [256]))])


class RefRoost(nn.Module):                           # roost_message.py:159-215
    def __init__(self, orig, f, n_graph):
        super().__init__()
        self.embedding = nn.Linear(orig, f - 1)
        self.graphs = nn.ModuleList(RefMessageLayer(f)
                                    for _ in range(n_graph))
        self.cry_pool = nn.ModuleList([RefWeightedAttention(
            RefSimple(f, 1, [256]), nn.Identity())])


class RefMHAttention(nn.Module):                     # CGAT.py:14-62
    def __init__(self, f, heads):
        super().__init__()
        self.MH_A = RefMultiHead(2 * f, f, f, heads)
        self.MH_M = RefMultiHead(f, f, f, heads)


class RefCGAtNet(nn.Module):                         # CGAT.py:359-537
    def __init__(self, orig, f, n_graph, fe, heads, n_roost):
        super().__init__()
        self.embedding = nn.Linear(orig, f, bias=False)
        self.nbr_embedding = nn.Embedding(4 + 1, fe)
        self.graphs = nn.ModuleList(nn.ModuleDict({
            "Node": RefGATNode(f, fe, heads, first=(i == 0)),
            "Edge": RefGATEdge(f, fe, heads)}) for i in range(n_graph))
        self.roost = RefRoost(orig, f, n_roost)
        self.cry_pool = RefMHAttention(f, heads)
        out_hidden = [1024, 1024, 512, 512, 256, 256, 128]
        self.output_nn = RefResidual(f * heads, 2, out_hidden)


HP = dict(atom_fea_len=8, n_graph=2, max_nbr=4, msg_heads=2, n_graph_roost=2,
          rezero=True, mean_pooling=True, update_edges=True,
          vector_attention=True, global_vector_attention=True,
          target="e_above_hull", batch_size=4, learning_rate=1e-3,
          optim="AdamW")


@pytest.fixture(scope="module")
def ref_and_imported():
    torch.manual_seed(0)
    # nbr_embedding_size is NOT forwarded by the reference trainer -> 128
    ref = RefCGAtNet(200, 8, 2, 128, 2, 2)
    sd = {f"model.{k}": v for k, v in ref.state_dict().items()}
    sd["mean"] = torch.tensor([0.25])
    sd["std"] = torch.tensor([2.0])
    cfg = config_from_hparams(HP)
    params, mean, std = params_from_state_dict(sd, cfg)
    return ref, cfg, params, mean, std


def test_strict_import_and_normalisation(ref_and_imported):
    _, _, params, mean, std = ref_and_imported
    assert mean == 0.25 and std == 2.0
    assert "graph_1_Node" in params and "damping" in \
        params["graph_1_Node"]["Pooling_NN"]
    assert "damping" not in params["graph_0_Node"]["Pooling_NN"]  # H_Net_0


def test_unconsumed_and_missing_keys_raise(ref_and_imported):
    ref, cfg, *_ = ref_and_imported
    sd = {f"model.{k}": v for k, v in ref.state_dict().items()}
    sd["model.graphs.0.Node.stray.weight"] = torch.zeros(1)
    with pytest.raises(ValueError, match="unconsumed"):
        params_from_state_dict(sd, cfg)
    sd2 = {f"model.{k}": v for k, v in ref.state_dict().items()}
    sd2.pop("model.output_nn.fc_out.bias")
    with pytest.raises(KeyError):
        params_from_state_dict(sd2, cfg)


def test_multihead_layout_transform(ref_and_imported):
    """Grouped Conv1d -> (H, out, in) einsum kernels: outputs must agree."""
    import jax

    from cgat_tpu.models.blocks import MultiHeadNetwork

    ref, _, params, _, _ = ref_and_imported
    mh_t = ref.graphs[0]["Node"].MH_A
    cat = 2 * 8 + 128
    x = np.random.default_rng(0).standard_normal((5, cat)).astype(np.float32)
    with torch.no_grad():
        want = mh_t(torch.tensor(x)).numpy()
    mod = MultiHeadNetwork(cat, 8, int(cat / 1.5), 2)
    got = np.asarray(mod.apply(
        {"params": params["graph_0_Node"]["MH_A"]}, jax.numpy.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_simple_and_fcblock_transforms(ref_and_imported):
    import jax

    from cgat_tpu.models.blocks import SimpleNetwork
    from cgat_tpu.models.hyper import FCBlock

    ref, _, params, _, _ = ref_and_imported
    x = np.random.default_rng(1).standard_normal((3, 128)).astype(np.float32)
    with torch.no_grad():
        want = ref.graphs[1]["Edge"].Pooling_NN(torch.tensor(x)).numpy()
    got = np.asarray(SimpleNetwork(128, [128]).apply(
        {"params": params["graph_1_Edge"]["Pooling_NN"]},
        jax.numpy.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    cond = np.random.default_rng(2).standard_normal((3, 8)).astype(np.float32)
    fcb_t = ref.graphs[0]["Node"].Pooling_NN.Hyper.layers[0] \
        .hyper_linear.hypo_params
    with torch.no_grad():
        want = fcb_t.net(torch.tensor(cond)).numpy()
    got = np.asarray(FCBlock(8, 3, 8 * 8 + 8).apply(
        {"params": params["graph_0_Node"]["Pooling_NN"]["Hyper"]
         ["layer_0"]["hypo_params"]}, jax.numpy.asarray(cond)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=2e-5)


def test_association_no_cross_wiring(ref_and_imported):
    """Distinct layers keep their own weights after import."""
    ref, _, params, _, _ = ref_and_imported
    pairs = [
        (ref.embedding.weight.T, params["embedding"]["kernel"]),
        (ref.nbr_embedding.weight, params["nbr_embedding"]["embedding"]),
        (ref.graphs[1]["Node"].Pooling_NN.damping,
         params["graph_1_Node"]["Pooling_NN"]["damping"]),
        (ref.graphs[1]["Node"].Pooling_NN.Hyper.layers[3].hypo_params
         .net[4].weight.T,
         params["graph_1_Node"]["Pooling_NN"]["Hyper"]["layer_last"]
         ["hypo_params"]["fc_last_kernel"]),
        (ref.roost.graphs[1].pooling[0].pow,
         params["roost"]["graph_1"]["head0_pow"]),
        (ref.roost.cry_pool[0].gate_nn.fc_out.weight.T,
         params["roost"]["cry_pool0_gate_nn"]["fc_out"]["kernel"]),
        (ref.output_nn.res_fcs[0].weight.T,
         params["output_nn"]["res_fc_0"]["kernel"]),
        (ref.output_nn.rezeros[3].alpha,
         params["output_nn"]["rezero_3"]["alpha"]),
    ]
    for want_t, got in pairs:
        np.testing.assert_array_equal(np.asarray(got),
                                      want_t.detach().numpy())


def test_import_checkpoint_cli_roundtrip(tmp_path, ref_and_imported):
    """Fake PL .ckpt -> run dir -> load_trainer -> finite forward."""
    import jax

    from cgat_tpu.data import collate
    from cgat_tpu.data.synthetic import random_graphs
    from cgat_tpu.models import CGAtNet
    from cgat_tpu.tools import import_torch as it

    ref, cfg, want_params, _, _ = ref_and_imported
    ckpt = {"state_dict": {**{f"model.{k}": v
                              for k, v in ref.state_dict().items()},
                           "mean": torch.tensor([0.25]),
                           "std": torch.tensor([2.0])},
            "hyper_parameters": HP, "epoch": 7, "global_step": 123}
    path = tmp_path / "ref.ckpt"
    torch.save(ckpt, path)
    out = it.import_checkpoint(str(path), str(tmp_path / "imported"))

    from cgat_tpu.training.trainer import CheckpointManager
    params, meta = CheckpointManager.load(out, tag="best")
    assert meta["mean"] == 0.25 and meta["std"] == 2.0
    assert meta["epoch"] == 7
    np.testing.assert_array_equal(
        params["embedding"]["kernel"], want_params["embedding"]["kernel"])

    graphs = random_graphs(0, 4, n_atoms_range=(3, 6), max_nbr=4,
                           orig_fea=200)
    batch = collate(graphs, max_nbr=4, node_bucket=8)
    out_arr = CGAtNet(cfg).apply(
        {"params": jax.tree.map(jax.numpy.asarray, params)}, batch)
    assert out_arr.shape == (batch.num_graphs, 2)
    assert bool(np.all(np.isfinite(np.asarray(out_arr))))


def test_export_reproduces_reference_state_dict(ref_and_imported):
    """export_state_dict is the exact inverse: same keys, same values as the
    torch module tree the weights came from."""
    from cgat_tpu.tools.import_torch import export_state_dict

    ref, cfg, params, _, _ = ref_and_imported
    got = export_state_dict(params, cfg)
    want = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    assert sorted(got) == sorted(want)
    for k in want:
        np.testing.assert_array_equal(np.asarray(got[k], np.float32),
                                      want[k].astype(np.float32), err_msg=k)


def test_export_import_checkpoint_roundtrip(tmp_path, ref_and_imported):
    """run dir -> reference .ckpt -> run dir keeps every weight bit-exact."""
    from cgat_tpu.tools import import_torch as it
    from cgat_tpu.training.trainer import CheckpointManager

    ref, cfg, want_params, _, _ = ref_and_imported
    ckpt = {"state_dict": {**{f"model.{k}": v
                              for k, v in ref.state_dict().items()},
                           "mean": torch.tensor([0.25]),
                           "std": torch.tensor([2.0])},
            "hyper_parameters": HP, "epoch": 7, "global_step": 123}
    torch.save(ckpt, tmp_path / "ref.ckpt")
    run = it.import_checkpoint(str(tmp_path / "ref.ckpt"),
                               str(tmp_path / "run"))
    back = it.export_checkpoint(run, str(tmp_path / "back.ckpt"))
    again = it.import_checkpoint(back, str(tmp_path / "run2"))
    p1, m1 = CheckpointManager.load(run, tag="best")
    p2, m2 = CheckpointManager.load(again, tag="best")
    assert m1["mean"] == m2["mean"] and m1["std"] == m2["std"]

    import jax
    flat1 = jax.tree_util.tree_flatten_with_path(p1)[0]
    flat2 = dict(jax.tree_util.tree_flatten_with_path(p2)[0])
    assert len(flat1) == len(flat2)
    for path, leaf in flat1:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(flat2[path]),
                                      err_msg=str(path))


def test_update_edges_false_refused(ref_and_imported):
    """The reference's update_edges=False branch is structurally broken
    (CGAT.py:406-425) and intentionally not importable/exportable."""
    import dataclasses

    from cgat_tpu.tools.import_torch import export_state_dict

    ref, cfg, params, _, _ = ref_and_imported
    cfg_ne = dataclasses.replace(cfg, update_edges=False)
    sd = {f"model.{k}": v for k, v in ref.state_dict().items()}
    with pytest.raises(ValueError, match="update_edges=False"):
        params_from_state_dict(sd, cfg_ne)
    with pytest.raises(ValueError, match="update_edges=False"):
        export_state_dict(params, cfg_ne)
