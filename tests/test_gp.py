"""SVGP tests: exact-GP limit, ELBO sanity, end-to-end fit quality."""
import numpy as np
import jax.numpy as jnp

from cgat_tpu.uncertainty import (
    GPConfig, confidence_region, elbo, fit_gp, gp_predict_f, gp_predict_y,
    init_gp, kl_divergence,
)


def test_kl_zero_at_standard_normal():
    params = init_gp(np.random.default_rng(0).standard_normal((5, 3)))
    assert abs(float(kl_divergence(params))) < 1e-6


def test_prior_predictive_matches_kernel():
    """With m=0, S=I the whitened q(f) equals the GP prior."""
    rng = np.random.default_rng(1)
    z = rng.standard_normal((8, 2)).astype(np.float32)
    params = init_gp(z)
    x = rng.standard_normal((4, 2)).astype(np.float32)
    mean, var = gp_predict_f(params, jnp.asarray(x))
    outputscale = np.log(2.0)  # softplus(0)
    np.testing.assert_allclose(np.asarray(mean), 0.0, atol=1e-5)
    # prior variance = k(x,x) = outputscale (whitened identity cancellation)
    np.testing.assert_allclose(np.asarray(var), np.log1p(1.0) * 0 + 0.6931472,
                               rtol=1e-4)


def test_elbo_increases_during_fit():
    rng = np.random.default_rng(2)
    x = rng.uniform(-3, 3, size=(256, 1)).astype(np.float32)
    y = np.sin(x[:, 0]) + 0.05 * rng.standard_normal(256).astype(np.float32)
    params, history = fit_gp(x, y, num_inducing=32, epochs=250,
                             batch_size=256, learning_rate=5e-2,
                             verbose=False)
    assert history[-1] < history[0]
    mu, var = gp_predict_f(params, jnp.asarray(x))
    mae = float(np.mean(np.abs(np.asarray(mu) - y)))
    assert mae < 0.15, mae
    # coverage of noisy observations needs the observed predictive (adds
    # likelihood noise); confidence_region itself is on latent f like
    # gpytorch's (gaussian_process.py:265)
    mu_y, var_y = gp_predict_y(params, jnp.asarray(x))
    lo, hi = confidence_region(mu_y, var_y)
    frac = float(np.mean((y >= np.asarray(lo)) & (y <= np.asarray(hi))))
    assert frac > 0.85, frac


def test_uncertainty_grows_off_data():
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, size=(128, 1)).astype(np.float32)
    y = x[:, 0] ** 2
    params, _ = fit_gp(x, y, num_inducing=16, epochs=100, batch_size=128,
                       learning_rate=5e-2, verbose=False)
    _, var_in = gp_predict_f(params, jnp.asarray([[0.0]], dtype=jnp.float32))
    _, var_out = gp_predict_f(params, jnp.asarray([[30.0]], dtype=jnp.float32))
    assert float(var_out[0]) > float(var_in[0])


def test_streaming_matches_precomputed_full_batch():
    """On-the-fly mode (frozen CGAT embeds inside the jitted GP step) must
    reproduce the precomputed-embedding trajectory when every epoch is one
    full batch: same inducing draw (same seed), order-invariant ELBO."""
    import jax
    from cgat_tpu.data import collate
    from cgat_tpu.data.synthetic import random_graphs
    from cgat_tpu.models import CGATConfig, CGAtNet
    from cgat_tpu.uncertainty import fit_gp_streaming

    tiny = dict(orig_elem_fea_len=12, elem_fea_len=8, n_graph=1,
                nbr_embedding_size=8, neighbor_number=4, msg_heads=2,
                n_graph_roost=1, out_hidden=(8,))
    cfg = CGATConfig(**tiny)
    graphs = random_graphs(0, 24, n_atoms_range=(3, 6), max_nbr=4,
                           orig_fea=12)
    model = CGAtNet(cfg)
    batch = collate(graphs, max_nbr=4, node_bucket=8, num_comp_slots=8)
    params = model.init(jax.random.key(0), batch)["params"]
    emb = np.asarray(model.apply({"params": params}, batch,
                                 return_graph_embedding=True))
    emb = emb[np.asarray(batch.graph_mask)]
    y = np.asarray([g.target for g in graphs], np.float32)
    mean, std = float(y.mean()), float(y.std(ddof=1))

    gp1, h1 = fit_gp(emb, (y - mean) / std, num_inducing=8, epochs=5,
                     batch_size=64, learning_rate=1e-2, seed=0,
                     verbose=False)
    gp2, h2 = fit_gp_streaming(model, params, graphs, mean=mean, std=std,
                               num_inducing=8, epochs=5, batch_size=64,
                               learning_rate=1e-2, seed=0, max_nbr=4,
                               node_bucket=8, num_comp_slots=8,
                               verbose=False)
    np.testing.assert_allclose(h2, h1, rtol=1e-4, atol=1e-5)
    # padding-level embedding noise (~1e-6) is Adam-normalised to O(lr) in
    # the params over 5 steps; lr-scale tolerance as in test_parallel.py
    for a, b in zip(jax.tree.leaves(gp2), jax.tree.leaves(gp1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-3)
