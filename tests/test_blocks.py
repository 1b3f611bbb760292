"""NN building blocks vs torch oracles, incl. grouped-Conv1d equivalence."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from cgat_tpu.models import blocks as B
from cgat_tpu.models import hyper as H
import torch_oracle as O


def to_np(tree):
    return jax.tree.map(np.asarray, tree)


def test_simple_network_matches_torch(rng):
    x = rng.standard_normal((7, 10)).astype(np.float32)
    mod = B.SimpleNetwork(4, [12, 6])
    params = mod.init(jax.random.key(0), jnp.asarray(x))["params"]
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
    want = O.simple_network(to_np(params), O.t(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_residual_network_rezero_and_last_layer(rng):
    x = rng.standard_normal((5, 9)).astype(np.float32)
    mod = B.ResidualNetwork(2, [9, 6], if_rezero=True)
    params = mod.init(jax.random.key(1), jnp.asarray(x))["params"]
    # perturb rezero alphas away from 0 so the branch is exercised
    params = jax.tree.map(lambda a: a, params)
    params["rezero_0"]["alpha"] = jnp.asarray([0.3])
    params["rezero_1"]["alpha"] = jnp.asarray([-0.2])
    for last in (True, False):
        got = np.asarray(mod.apply({"params": params}, jnp.asarray(x),
                                   last_layer=last))
        want = O.residual_network(to_np(params), O.t(x), last_layer=last).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_multi_head_network_matches_grouped_conv1d(rng):
    """The einsum formulation must equal the reference's grouped Conv1d with
    input repeated per head (reference CGAT.py:91-109)."""
    heads, in_dim, hid, out = 3, 8, 5, 4
    x = rng.standard_normal((6, in_dim)).astype(np.float32)
    mod = B.MultiHeadNetwork(in_dim, out, hid, heads)
    params = mod.init(jax.random.key(2), jnp.asarray(x))["params"]
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))

    conv_in = torch.nn.Conv1d(in_dim * heads, hid * heads, 1, groups=heads)
    conv_out = torch.nn.Conv1d(hid * heads, out * heads, 1, groups=heads)
    with torch.no_grad():
        conv_in.weight.copy_(O.t(params["fc_in_kernel"]).reshape(
            heads * hid, in_dim).unsqueeze(-1))
        conv_in.bias.copy_(O.t(params["fc_in_bias"]).reshape(-1))
        conv_out.weight.copy_(O.t(params["fc_out_kernel"]).reshape(
            heads * out, hid).unsqueeze(-1))
        conv_out.bias.copy_(O.t(params["fc_out_bias"]).reshape(-1))
    xt = O.t(x).view(-1, in_dim, 1).repeat(1, heads, 1)
    want = conv_out(F.leaky_relu(conv_in(xt), 0.01)).view(-1, heads, out)
    np.testing.assert_allclose(got, want.detach().numpy(), rtol=1e-5, atol=1e-5)
    # also the loop oracle
    want2 = O.multi_head_network(to_np(params), O.t(x)).numpy()
    np.testing.assert_allclose(got, want2, rtol=1e-5, atol=1e-6)


def test_multi_head_network_flattens_stacked_input(rng):
    """MHAttention feeds (N, 2, F) with view=False; must flatten to (N, 2F)."""
    x = rng.standard_normal((4, 2, 6)).astype(np.float32)
    mod = B.MultiHeadNetwork(12, 3, 5, 2)
    params = mod.init(jax.random.key(3), jnp.asarray(x))["params"]
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
    want = O.multi_head_network(to_np(params), O.t(x.reshape(4, 12))).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_hyperfc_matches_oracle(rng):
    cond = rng.standard_normal((5, 6)).astype(np.float32)
    x = rng.standard_normal((5, 6)).astype(np.float32)
    mod = H.HyperFC(hyper_num_hidden_layers=2, hyper_hidden_ch=6, hidden_ch=6,
                    num_hidden_layers=1, in_ch=6, out_ch=6)
    params = mod.init(jax.random.key(4), jnp.asarray(cond), jnp.asarray(x))["params"]
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(cond),
                               jnp.asarray(x)))
    want = O.hyper_fc(to_np(params), O.t(cond), O.t(x), 6, 6).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_hnet_damping_clamped(rng):
    h0 = rng.standard_normal((3, 4)).astype(np.float32)
    x = rng.standard_normal((3, 4)).astype(np.float32)
    mod = H.HNet(4, 1, 4, 4, 0, 4, 4)
    params = mod.init(jax.random.key(5), jnp.asarray(h0), jnp.asarray(h0),
                      jnp.asarray(x))["params"]
    params["damping"] = jnp.asarray([1.7])  # out of range -> clamp to 1.0
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(h0),
                               jnp.asarray(h0), jnp.asarray(x)))
    want = O.h_net(to_np(params), O.t(h0), O.t(h0), O.t(x), 4).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
