"""Sparse variational GP uncertainty head (JAX, TPU-native).

Re-derivation of the reference's gpytorch stack
(reference: CGAT/gaussian_process.py:45-70, 228-233): whitened
VariationalStrategy with learnable inducing points, CholeskyVariationalDistribution,
ConstantMean|ZeroMean, ScaleKernel(RBF) and a GaussianLikelihood trained by
maximising the VariationalELBO (loss = -ELBO, gaussian_process.py:277).

All linear algebra is batched f32 Cholesky/triangular-solve on the MXU with a
jitter ladder for stability (TPU f32 Cholesky needs explicit jitter).

Math (Hensman et al. SVGP, whitened): with Z the M inducing points,
Kzz = Lz Lz^T, A = Lz^{-1} Kzx, and q(v) = N(m, S), S = L L^T:
  mean(f(x)) = mu(x) + A^T m
  var(f(x))  = k(x,x) - ||A||^2 + ||L^T A||^2  (columnwise)
  ELBO = mean_i E_q[log N(y_i | f_i, sigma^2)] - KL(q(v) || N(0, I)) / N
"""
from __future__ import annotations

import dataclasses


import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct


def softplus(x):
    return jax.nn.softplus(x)


def inv_softplus(y):
    return float(np.log(np.expm1(y)))


@struct.dataclass
class GPParams:
    inducing: jnp.ndarray        # (M, D) learnable inducing locations
    var_mean: jnp.ndarray        # (M,)
    var_chol: jnp.ndarray        # (M, M) lower-triangular factor of S
    raw_lengthscale: jnp.ndarray # () softplus-constrained
    raw_outputscale: jnp.ndarray # ()
    raw_noise: jnp.ndarray       # ()
    mean_const: jnp.ndarray      # () constant mean (0 and frozen if zero_mean)


@dataclasses.dataclass(frozen=True)
class GPConfig:
    zero_mean: bool = False
    jitter: float = 1e-5


def init_gp(inducing_points: np.ndarray, cfg: GPConfig = GPConfig()) -> GPParams:
    m = inducing_points.shape[0]
    return GPParams(
        inducing=jnp.asarray(inducing_points, jnp.float32),
        var_mean=jnp.zeros((m,), jnp.float32),
        var_chol=jnp.eye(m, dtype=jnp.float32),
        raw_lengthscale=jnp.zeros((), jnp.float32),   # softplus(0) = 0.693
        raw_outputscale=jnp.zeros((), jnp.float32),
        raw_noise=jnp.zeros((), jnp.float32),
        mean_const=jnp.zeros((), jnp.float32),
    )


def _rbf(x1, x2, lengthscale, outputscale):
    """ScaleKernel(RBFKernel): s^2 * exp(-0.5 d^2 / l^2)."""
    x1 = x1 / lengthscale
    x2 = x2 / lengthscale
    d2 = (jnp.sum(x1 * x1, -1)[:, None] + jnp.sum(x2 * x2, -1)[None, :]
          - 2.0 * x1 @ x2.T)
    return outputscale * jnp.exp(-0.5 * jnp.maximum(d2, 0.0))


def _chol_with_jitter(K, base_jitter):
    """Cholesky with a fixed jitter (f32 on TPU needs it)."""
    m = K.shape[0]
    return jnp.linalg.cholesky(K + base_jitter * jnp.eye(m, dtype=K.dtype))


def gp_predict_f(params: GPParams, x, cfg: GPConfig = GPConfig()):
    """Latent predictive mean and variance at x (B, D)."""
    ls = softplus(params.raw_lengthscale)
    os_ = softplus(params.raw_outputscale)
    z = params.inducing
    kzz = _rbf(z, z, ls, os_)
    kzx = _rbf(z, x, ls, os_)
    lz = _chol_with_jitter(kzz, cfg.jitter)
    a = jax.scipy.linalg.solve_triangular(lz, kzx, lower=True)      # (M, B)
    mean = params.mean_const + a.T @ params.var_mean
    ltril = jnp.tril(params.var_chol)
    lta = ltril.T @ a
    kxx_diag = os_ * jnp.ones(x.shape[0], x.dtype)
    var = kxx_diag - jnp.sum(a * a, 0) + jnp.sum(lta * lta, 0)
    return mean, jnp.maximum(var, 1e-10)


def gp_predict_y(params: GPParams, x, cfg: GPConfig = GPConfig()):
    """Observed predictive (adds likelihood noise)."""
    mean, var = gp_predict_f(params, x, cfg)
    return mean, var + softplus(params.raw_noise)


def kl_divergence(params: GPParams):
    """KL(q(v) || N(0, I)) for the whitened variational distribution."""
    ltril = jnp.tril(params.var_chol)
    m = params.var_mean
    tr = jnp.sum(ltril * ltril)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diag(ltril)) + 1e-20))
    k = m.shape[0]
    return 0.5 * (tr + m @ m - k - logdet)


def elbo(params: GPParams, x, y, num_data: int, cfg: GPConfig = GPConfig(),
         mask=None):
    """VariationalELBO (gpytorch semantics): batch-mean expected log
    likelihood minus KL/num_data."""
    mean, var = gp_predict_f(params, x, cfg)
    noise = softplus(params.raw_noise)
    ell = -0.5 * (jnp.log(2.0 * jnp.pi * noise)
                  + ((y - mean) ** 2 + var) / noise)
    if mask is not None:
        ell_mean = jnp.sum(jnp.where(mask, ell, 0.0)) / jnp.maximum(
            jnp.sum(mask), 1.0)
    else:
        ell_mean = jnp.mean(ell)
    return ell_mean - kl_divergence(params) / num_data


def confidence_region(mean, var):
    """mean +- 2 std of the latent f (gpytorch confidence_region)."""
    sd = jnp.sqrt(var)
    return mean - 2.0 * sd, mean + 2.0 * sd


def _freeze_mean_if_zero(grads, cfg: GPConfig):
    if cfg.zero_mean:
        return grads.replace(mean_const=jnp.zeros_like(grads.mean_const))
    return grads


def fit_gp(embeddings: np.ndarray, targets_norm: np.ndarray, *,
           num_inducing: int = 500, epochs: int = 100, batch_size: int = 512,
           learning_rate: float = 1e-2, seed: int = 0,
           cfg: GPConfig = GPConfig(), verbose: bool = True):
    """Train an SVGP on (normalised) targets. Inducing points initialise from
    a random training batch (gaussian_process.py:208-227)."""
    rng = np.random.default_rng(seed)
    n = embeddings.shape[0]
    idx = rng.permutation(n)[: min(num_inducing, n)]
    params = init_gp(embeddings[idx], cfg)
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        def loss_fn(p):
            return -elbo(p, xb, yb, n, cfg)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        grads = _freeze_mean_if_zero(grads, cfg)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    x = jnp.asarray(embeddings, jnp.float32)
    y = jnp.asarray(targets_norm, jnp.float32)
    steps_per_epoch = max(1, n // batch_size)
    history = []
    for epoch in range(epochs):
        order = rng.permutation(n)
        tot = 0.0
        for b in range(steps_per_epoch):
            sel = order[b * batch_size:(b + 1) * batch_size]
            params, opt_state, loss = step(params, opt_state, x[sel], y[sel])
            tot += float(loss)
        history.append(tot / steps_per_epoch)
        if verbose and (epoch % max(1, epochs // 10) == 0):
            print(f"gp epoch {epoch}: -elbo {history[-1]:.4f}")
    return params, history


def fit_gp_streaming(model, cgat_params, graphs, *, mean: float, std: float,
                     num_inducing: int = 500, epochs: int = 100,
                     batch_size: int = 512, learning_rate: float = 1e-2,
                     seed: int = 0, cfg: GPConfig = GPConfig(),
                     max_nbr: int = 24, node_bucket: int = 64,
                     num_comp_slots=None, verbose: bool = True):
    """On-the-fly SVGP training: the frozen CGAT embeds every graph batch
    INSIDE the jitted GP step (reference gaussian_process.py:241-296), so a
    2.8M-entry pool never materialises a full (N, embedding_dim) matrix —
    each step is one dispatch: embed (stop-gradient) -> masked ELBO -> Adam.

    Inducing points are the embeddings of one random ``num_inducing``-graph
    batch (gaussian_process.py:213-222); padded graph slots are excluded via
    the batch mask, so metrics are exact regardless of batch shape."""
    from ..data.dataset import GraphLoader

    rng = np.random.default_rng(seed)
    n = len(graphs)
    sel = rng.permutation(n)[: min(num_inducing, n)]
    embed = jax.jit(lambda p, b: model.apply(
        {"params": p}, b, return_graph_embedding=True))
    ind_loader = GraphLoader([graphs[i] for i in sel], len(sel),
                             shuffle=False, max_nbr=max_nbr,
                             node_bucket=node_bucket,
                             num_comp_slots=num_comp_slots)
    ind_loader.drop_last = False
    inducing = np.concatenate(
        [np.asarray(embed(cgat_params, b))[np.asarray(b.graph_mask)]
         for b in ind_loader])
    params = init_gp(inducing, cfg)
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)

    @jax.jit
    def step(gp, opt_state, backbone, batch):
        emb = jax.lax.stop_gradient(model.apply(
            {"params": backbone}, batch, return_graph_embedding=True))
        y = (batch.target - mean) / std

        def loss_fn(p):
            return -elbo(p, emb, y, n, cfg, mask=batch.graph_mask)

        loss, grads = jax.value_and_grad(loss_fn)(gp)
        grads = _freeze_mean_if_zero(grads, cfg)
        updates, opt_state2 = tx.update(grads, opt_state, gp)
        return optax.apply_updates(gp, updates), opt_state2, loss

    loader = GraphLoader(graphs, min(batch_size, n), shuffle=True, seed=seed,
                         max_nbr=max_nbr, node_bucket=node_bucket,
                         num_comp_slots=num_comp_slots)
    history = []
    for epoch in range(epochs):
        loader.set_epoch(epoch)
        losses_e = []
        for batch in loader:
            params, opt_state, loss = step(params, opt_state, cgat_params,
                                           batch)
            losses_e.append(loss)
        # single stack + read per epoch (axon D2H reads are ~an RTT each)
        history.append(float(jnp.mean(jnp.stack(losses_e))))
        if verbose and (epoch % max(1, epochs // 10) == 0):
            print(f"gp epoch {epoch}: -elbo {history[-1]:.4f}")
    return params, history


# ------------------------------------------------------------------ pipeline

def embedding_dataset(data, target: str = "e_above_hull_new"):
    """EmbeddingData equivalent (gaussian_process.py:33-41): a prepared dict
    whose 'input' was overwritten with (C, embedding_dim) arrays."""
    import gzip
    import pickle
    if isinstance(data, str):
        with gzip.open(data, "rb") as f:
            data = pickle.load(f)
    x = np.asarray(data["input"], np.float32)
    y = np.asarray(data["target"][target], np.float32).reshape(-1)
    return x, y


def train_gp_from_checkpoint(args):
    """CLI driver (gaussian_process.py:568-673): frozen CGAT -> embeddings ->
    SVGP on normalised targets -> pickle with params + normalisation."""
    import gzip
    import pickle

    from ..data.dataset import load_dataset_dir, split_dataset
    from ..training.trainer import load_trainer

    trainer, params, _ = load_trainer(args.cgat_model, train=False)
    on_the_fly = bool(getattr(args, "on_the_fly", False))
    graphs = None
    if args.embedding_path:
        x, y = embedding_dataset(args.embedding_path, trainer.cfg.target)
        on_the_fly = False  # embeddings already materialised
        n = len(x)
    else:
        data_path = args.data_path or trainer.cfg.data_path
        graphs = load_dataset_dir(data_path, fea_path=trainer.cfg.fea_path,
                                  max_neighbor_number=trainer.cfg.max_nbr,
                                  target=trainer.cfg.target)
        y = np.asarray([g.target for g in graphs], np.float32)
        n = len(graphs)
        devices = int(getattr(args, "devices", 1) or 1)
        if on_the_fly:
            x = None
        elif devices > 1:
            x = trainer.embeddings_parallel(params, graphs, devices)
        else:
            x = trainer.embeddings(params, graphs)

    tr, va, te = split_dataset(n, seed=args.seed)
    mean = float(np.mean(y[tr]))
    std = float(np.std(y[tr], ddof=1)) if len(tr) > 1 else 1.0
    cfg = GPConfig(zero_mean=args.zero_mean)
    if on_the_fly:
        # streaming: embed each batch inside the GP step; only the small
        # val split is ever materialised as an embedding matrix
        gp_params, history = fit_gp_streaming(
            trainer.model, params, [graphs[i] for i in tr],
            mean=mean, std=std, num_inducing=args.inducing_points,
            epochs=args.epochs, batch_size=args.batch_size,
            learning_rate=args.learning_rate, seed=args.seed, cfg=cfg,
            max_nbr=trainer.cfg.max_nbr, node_bucket=trainer.cfg.node_bucket,
            num_comp_slots=trainer.cfg.num_comp_slots)
        x_va = trainer.embeddings(params, [graphs[i] for i in va])
    else:
        gp_params, history = fit_gp(
            x[tr], (y[tr] - mean) / std, num_inducing=args.inducing_points,
            epochs=args.epochs, batch_size=args.batch_size,
            learning_rate=args.learning_rate, seed=args.seed, cfg=cfg)
        x_va = x[va]

    mu, var = gp_predict_f(gp_params, jnp.asarray(x_va, jnp.float32), cfg)
    pred = np.asarray(mu) * std + mean
    val_mae = float(np.mean(np.abs(pred - y[va]))) if len(va) else float("nan")
    print(f"gp val mae: {val_mae:.4f}")

    out = {
        "params": jax.tree.map(np.asarray, gp_params),
        "mean": mean, "std": std, "zero_mean": args.zero_mean,
        "val_mae": val_mae, "history": history,
    }
    with gzip.open(args.out, "wb") as f:
        pickle.dump(out, f)
    print(f"wrote {args.out}")
    return out


def load_gp(path: str):
    import gzip
    import pickle
    with gzip.open(path, "rb") as f:
        d = pickle.load(f)
    params = GPParams(**{k: jnp.asarray(v) for k, v in
                         dataclasses.asdict(d["params"]).items()}) \
        if dataclasses.is_dataclass(d["params"]) else d["params"]
    return params, d
