"""Training system (reference: CGAT/lightning_module.py + CGAT/train.py).

The PyTorch-Lightning module + DDP trainer of the reference becomes a
functional JAX trainer: a jitted ``train_step`` (loss -> grad -> optax update,
all fused by XLA), host-side epoch loop with epoch-level LR scheduling via
``optax.inject_hyperparams`` (no recompiles), target normalisation computed
once from the training split, top-1 ``val_mae`` checkpointing through orbax,
and JSONL/TensorBoard metric logging.

Key parity points:
* normalisation mean/std over all train targets with torch's unbiased std
  (lightning_module.py:120-128), persisted in the checkpoint so reloads need
  no data pass;
* default criterion is plain L1 on normalised targets; Robust losses opt-in
  (lightning_module.py:130-142);
* metrics: loss on normalised scale, mae/rmse on denormalised predictions vs
  raw ``y`` (lightning_module.py:227-301);
* ``only_residual`` trains just the output head (transfer learning,
  lightning_module.py:314-316).
"""
from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..data.batching import CrystalBatch
from ..data.dataset import GraphLoader, split_dataset
from ..models.cgat import CGATConfig, CGAtNet
from . import losses as L
from . import schedules
from .lamb import lamb


@dataclasses.dataclass
class TrainerConfig:
    """Optimisation/data flags (reference argparse,
    lightning_module.py:426-593 and train.py:82-131, with the inverted
    ``store_false`` booleans resolved to explicit values)."""
    # data
    data_path: str = "data/"
    fea_path: str | None = None
    target: str = "e_above_hull_new"
    max_nbr: int = 24
    val_size: float = 0.1
    test_size: float = 0.1
    train_percentage: float = 0.0
    val_path: str | None = None
    test_path: str | None = None
    # out-of-core training: stream data_path's shards one at a time instead
    # of holding the dataset in host memory (the reference pool is 283x10k
    # shards, Utilities/calculate_errors.py:71); requires val_path/test_path
    # for the in-memory eval splits
    streaming: bool = False
    # optimisation
    batch_size: int = 64
    epochs: int = 390
    optim: str = "AdamW"            # SGD | Adam | AdamW | LAMB
    learning_rate: float = 0.000125
    momentum: float = 0.9
    weight_decay: float = 1e-6
    # dtype of Adam/AdamW's FIRST moment (m). bf16 halves its HBM traffic
    # (the optimizer apply is HBM-bound at 28 B/param — measured -0.39
    # ms/step on v5e, docs/PERFORMANCE.md round 5) and is numerically safe:
    # with b1=0.9 each update moves m by ~10% relative, far above bf16's
    # 2^-8 resolution. The SECOND moment stays f32 always — b2=0.999 means
    # ~1e-3 relative increments that bf16 rounding would silently drop,
    # freezing v. Default f32 = exact reference AdamW semantics; the CLI
    # production profile (bf16 compute) opts in (cli/common.py).
    moment_dtype: str = "float32"
    loss: str = "L1"                # L1 | L2
    robust_loss: bool = False       # reference --std-loss inverted default
    clr: bool = True
    clr_period: int = 130
    acc_batches: int = 1
    only_residual: bool = False
    seed: int = 0
    check_val_every_n_epoch: int = 2
    # batching
    node_bucket: int = 64
    num_comp_slots: int | None = None
    # io
    ckpt_dir: str = "tb_logs"
    run_name: str | None = None
    log_tensorboard: bool = False
    # refresh the crash-safe "last" checkpoint every N non-improving val
    # epochs (1 = every val epoch; saves cost ~20 s D2H each on the tunnel)
    last_ckpt_every: int = 1
    # kernels: "auto" uses the fused Pallas path on TPU, XLA elsewhere
    attention_backend: str = "auto"
    # observability
    profile_epoch: int = -1      # capture a jax.profiler trace of this epoch
    nan_guard: bool = True       # stop on non-finite loss
    # fuse this many train steps into one device dispatch (lax.scan);
    # amortises dispatch latency, single-device path only
    steps_per_dispatch: int = 1
    # model plug-in: import this module and use its CGAtNet class, like the
    # reference's --version dynamic import (lightning_module.py:161-176)
    version: str = ""
    # concatenate tiny parameter leaves into one vector for the optimizer
    # apply (bit-exact for elementwise optimizers; training/flatten.py).
    # Default OFF: standalone the apply is 1.9x faster, but inside the real
    # train step the concat barriers on every grad and costs ~2 ms of
    # backward/apply overlap (measured on-chip, docs/PERFORMANCE.md)
    flat_optimizer: bool = False
    # parallelism
    n_devices: int = 1              # data-parallel devices (1 = single chip)
    edge_shards: int = 1            # edge-partition shards per replica


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def make_optimizer(cfg: TrainerConfig, params=None):
    """Build the optax chain matching lightning_module.py:306-355."""
    mu_dtype = (jnp.bfloat16 if cfg.moment_dtype == "bfloat16"
                else jnp.float32)

    def base(learning_rate):
        if cfg.optim == "SGD":
            sgd = optax.sgd(learning_rate, momentum=cfg.momentum)
            if cfg.weight_decay == 0:
                return sgd
            return optax.chain(optax.add_decayed_weights(cfg.weight_decay),
                               sgd)
        if cfg.optim == "Adam":
            return optax.chain(optax.add_decayed_weights(cfg.weight_decay),
                               optax.adam(learning_rate, mu_dtype=mu_dtype))
        if cfg.optim == "AdamW":
            return optax.adamw(learning_rate, weight_decay=cfg.weight_decay,
                               mu_dtype=mu_dtype)
        if cfg.optim == "LAMB":
            return lamb(learning_rate, weight_decay=cfg.weight_decay)
        raise NameError("Only SGD, Adam, AdamW, LAMB are allowed as optim")

    # pin the injected lr's dtype: inject_hyperparams otherwise casts it to
    # the first leaf's dtype, which under flatten_small can be a bf16 group
    tx = optax.inject_hyperparams(base, hyperparam_dtype=jnp.float32)(
        learning_rate=cfg.learning_rate)
    if cfg.flat_optimizer and cfg.optim != "LAMB" and not cfg.only_residual:
        # collapse the ~300 tiny-leaf update fusions into one (bit-exact for
        # these elementwise optimizers; LAMB's per-tensor trust ratio and the
        # only_residual label mapping both need the original tree)
        from .flatten import flatten_small
        tx = flatten_small(tx)
    if cfg.only_residual:
        # transfer learning: train only the output head; every other subtree
        # gets zero updates (lightning_module.py:314-316, CGAT.py:605-606)
        def label_fn(params):
            return {k: ("train" if k == "output_nn" else "freeze")
                    for k in params}
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, label_fn)
    if cfg.acc_batches > 1:
        tx = optax.MultiSteps(tx, cfg.acc_batches)
    return tx


def set_learning_rate(opt_state, lr: float):
    """Return a copy of ``opt_state`` with every injected ``learning_rate``
    hyperparam replaced (epoch-level scheduling without recompilation).

    Purely functional: rebuilds the containers on the path to each
    ``InjectHyperparamsState`` instead of mutating ``hyperparams`` dicts in
    place, so it stays correct when the jitted step donates the state and
    under arbitrary ``MultiSteps``/``multi_transform`` nesting."""
    found = []

    def rebuild(s):
        if hasattr(s, "hyperparams") and isinstance(s.hyperparams, dict) \
                and "learning_rate" in s.hyperparams and hasattr(s, "_replace"):
            found.append(True)
            hp = dict(s.hyperparams)
            hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
            return s._replace(hyperparams=hp)
        if isinstance(s, tuple):
            new = [rebuild(x) for x in s]
            # NamedTuple (optax states) vs plain tuple (optax.chain)
            return type(s)(*new) if hasattr(s, "_fields") else tuple(new)
        if isinstance(s, list):
            return [rebuild(x) for x in s]
        if isinstance(s, dict):
            return {k: rebuild(v) for k, v in s.items()}
        for attr in ("inner_state", "inner_opt_state", "inner_states"):
            inner = getattr(s, attr, None)
            if inner is not None and hasattr(s, "_replace"):
                return s._replace(**{attr: rebuild(inner)})
        return s

    new_state = rebuild(opt_state)
    if not found:
        raise RuntimeError("no injected learning_rate found in opt state")
    return new_state


def project_params(params):
    """Reference parity: HNet's ``damping`` parameter is clamped to [0, 1]
    in place at every forward (projected gradient,
    Hypernetworksmp.py:309-313). Functionally that equals projecting the
    stored parameter after each optimizer update — the forward already uses
    the straight-through-clipped value."""
    def proj(path, leaf):
        key = getattr(path[-1], "key", None) if path else None
        if key == "damping":
            return jnp.clip(leaf, 0.0, 1.0)
        return leaf
    return jax.tree_util.tree_map_with_path(proj, params)


def _metrics(output, log_std, target, mask, mean, std, criterion):
    target_norm = (target - mean) / std
    loss = criterion(output, log_std, target_norm, mask)
    pred = output * std + mean
    mae = L.l1(pred, target, mask)
    rmse = jnp.sqrt(L.mse(pred, target, mask))
    return loss, {"loss": loss, "mae": mae, "rmse": rmse}


def make_train_step(model: CGAtNet, tx, criterion, mean: float, std: float,
                    donate: bool = True, dropout: bool = False, seed: int = 0):
    """``dropout=True`` runs the model stochastically (deterministic=False)
    with a per-step rng folded from ``state.step`` — reproducible across
    resume (reference: PyG dropout in message passing, CGAT.py:324)."""
    def step_fn(state: TrainState, batch: CrystalBatch):
        def loss_fn(params):
            if dropout:
                rngs = {"dropout": jax.random.fold_in(
                    jax.random.key(seed), state.step)}
                out = model.apply({"params": params}, batch,
                                  deterministic=False, rngs=rngs)
            else:
                out = model.apply({"params": params}, batch)
            output, log_std = out[:, 0], out[:, 1]
            loss, m = _metrics(output, log_std, batch.target,
                               batch.graph_mask, mean, std, criterion)
            return loss, m

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = project_params(optax.apply_updates(state.params, updates))
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_multi_step(model: CGAtNet, tx, criterion, mean: float, std: float,
                    donate: bool = True, dropout: bool = False,
                    seed: int = 0, unroll: bool = True):
    """K train steps fused into ONE dispatch over a stacked batch (leading
    axis = step). Amortises per-dispatch overhead — a donated dispatch of
    the 1129-leaf flagship train state costs ~4.6 ms of pure host/tunnel
    time on axon (measured round 3), ~25% of the step. ``unroll=True``
    (default) chains the K steps as straight-line XLA code, so the state
    threads through SSA with no copies; ``unroll=False`` uses lax.scan,
    whose 750 MB carry is copied every iteration (measured +9.7 ms/step —
    rejected, kept for memory-constrained very large K). Returns per-chunk
    mean metrics (exact when all steps carry equal graph counts, which
    drop_last batching guarantees)."""

    def one_step(state: TrainState, batch: CrystalBatch):
        def loss_fn(params):
            if dropout:
                rngs = {"dropout": jax.random.fold_in(
                    jax.random.key(seed), state.step)}
                out = model.apply({"params": params}, batch,
                                  deterministic=False, rngs=rngs)
            else:
                out = model.apply({"params": params}, batch)
            output, log_std = out[:, 0], out[:, 1]
            loss, m = _metrics(output, log_std, batch.target,
                               batch.graph_mask, mean, std, criterion)
            return loss, m

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = project_params(optax.apply_updates(state.params, updates))
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), metrics

    def multi(state: TrainState, stacked: CrystalBatch):
        if unroll:
            k_steps = jax.tree.leaves(stacked)[0].shape[0]
            ms = []
            for k in range(k_steps):
                batch_k = jax.tree.map(lambda x: x[k], stacked)
                state, m = one_step(state, batch_k)
                ms.append(m)
            return state, jax.tree.map(
                lambda *xs: jnp.mean(jnp.stack(xs)), *ms)
        state, ms = jax.lax.scan(one_step, state, stacked)
        return state, jax.tree.map(jnp.mean, ms)

    return jax.jit(multi, donate_argnums=(0,) if donate else ())


def make_eval_step(model: CGAtNet, criterion, mean: float, std: float):
    def step_fn(params, batch: CrystalBatch):
        out = model.apply({"params": params}, batch)
        output, log_std = out[:, 0], out[:, 1]
        _, m = _metrics(output, log_std, batch.target, batch.graph_mask,
                        mean, std, criterion)
        n = jnp.sum(batch.graph_mask.astype(jnp.float32))
        return {k: v * n for k, v in m.items()} | {"n": n}

    return jax.jit(step_fn)


def make_predict_step(model: CGAtNet, mean: float, std: float):
    def step_fn(params, batch: CrystalBatch):
        out = model.apply({"params": params}, batch)
        return out[:, 0] * std + mean, out[:, 1]

    return jax.jit(step_fn)


class MetricsLogger:
    """JSONL metrics log + optional TensorBoard (reference used
    TensorBoardLogger, train.py:40)."""

    def __init__(self, log_dir: str, tensorboard: bool = False,
                 enabled: bool = True):
        # multi-host: only process 0 writes (the reference's rank_zero
        # Lightning logging); other ranks get a no-op logger
        self.enabled = enabled
        if not enabled:
            return
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def log(self, step: int, **metrics):
        if not self.enabled:
            return
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), step)


class Trainer:
    """End-to-end trainer (LightningModel + pl.Trainer equivalent)."""

    def __init__(self, cfg: TrainerConfig, model_cfg: CGATConfig,
                 graphs=None, *, mean: float | None = None,
                 std: float | None = None):
        self.cfg = cfg
        self.model_cfg = model_cfg
        if cfg.version:
            import importlib
            self.model = importlib.import_module(cfg.version).CGAtNet(model_cfg)
        else:
            self.model = CGAtNet(model_cfg)
        self.criterion = L.make_loss(cfg.loss, cfg.robust_loss)
        self.rng = jax.random.key(cfg.seed)
        from ..ops import attention as _att
        backend = cfg.attention_backend
        if backend == "auto":
            # honest sync-mode measurement on v5e: the fused Pallas kernel
            # halves the full train step (39.5 vs 82.7 ms/step at batch 64)
            backend = "pallas" if jax.default_backend() == "tpu" else "xla"
        _att.set_backend(backend)

        if cfg.streaming:
            self._setup_streaming()
        elif graphs is not None:
            self._setup_data(graphs)
        elif mean is not None:
            self.mean, self.std = float(mean), float(std)
            self.train_graphs = self.val_graphs = self.test_graphs = []
        else:
            from ..data.dataset import load_dataset_dir
            all_graphs = load_dataset_dir(
                cfg.data_path, fea_path=cfg.fea_path,
                max_neighbor_number=cfg.max_nbr, target=cfg.target)
            self._setup_data(all_graphs)

    def _setup_streaming(self):
        """Out-of-core setup: one cached metadata scan supplies the
        normalisation stats and static-shape bounds; train shards stay on
        disk, val/test splits load in memory from their own paths."""
        cfg = self.cfg
        from ..data.dataset import load_dataset_dir
        from ..data.streaming import scan_shard_metadata
        if cfg.val_path is None:
            raise ValueError("streaming=True requires --val-path (the "
                             "training shards are never all in memory, so "
                             "index-based splits cannot apply)")
        self._stream_meta = scan_shard_metadata(
            cfg.data_path, target=cfg.target, fea_path=cfg.fea_path,
            max_nbr=cfg.max_nbr)
        self.mean = self._stream_meta["mean"]
        self.std = self._stream_meta["std"]
        print(f"mean: {self.mean} std: {self.std} "
              f"({self._stream_meta['n_graphs']} streamed graphs)")
        self.train_graphs = []
        self.val_graphs = load_dataset_dir(
            cfg.val_path, fea_path=cfg.fea_path,
            max_neighbor_number=cfg.max_nbr, target=cfg.target)
        self.test_graphs = load_dataset_dir(
            cfg.test_path, fea_path=cfg.fea_path,
            max_neighbor_number=cfg.max_nbr,
            target=cfg.target) if cfg.test_path else []
        if cfg.num_comp_slots is None:
            # pin the composition axis dataset-wide (streamed + eval splits)
            self.cfg = dataclasses.replace(cfg, num_comp_slots=max(
                self._stream_meta["num_comp_slots"],
                max((g.comp_fea.shape[0]
                     for g in self.val_graphs + self.test_graphs), default=1)))

    def _streaming_loader(self, process_sliced: bool = True):
        cfg = self.cfg
        from ..data.streaming import StreamingGraphLoader
        n_proc = jax.process_count() if process_sliced else 1
        return StreamingGraphLoader(
            cfg.data_path, cfg.batch_size, target=cfg.target,
            fea_path=cfg.fea_path, shuffle=True, seed=cfg.seed,
            max_nbr=cfg.max_nbr, node_bucket=cfg.node_bucket,
            meta=self._stream_meta,
            process_index=jax.process_index() if process_sliced else 0,
            process_count=n_proc)

    def _grouped_loader(self, n_replicas: int, *, edge_shards: int = 1):
        """Stacked-group train loader for the mesh / multi-step paths —
        in-memory or out-of-core depending on ``cfg.streaming``."""
        cfg = self.cfg
        from ..parallel import ParallelLoader, StreamingParallelLoader
        if cfg.streaming:
            # every process must see every shard (group-wide pad dims);
            # the dp-row split happens inside the group collation
            return StreamingParallelLoader(
                self._streaming_loader(process_sliced=False), n_replicas,
                edge_shards=edge_shards,
                process_index=jax.process_index(),
                process_count=jax.process_count())
        return ParallelLoader(
            self.train_graphs, cfg.batch_size, n_replicas,
            shuffle=True, seed=cfg.seed, max_nbr=cfg.max_nbr,
            node_bucket=cfg.node_bucket,
            num_comp_slots=cfg.num_comp_slots,  # None -> loader derives max
            edge_shards=edge_shards,
            process_index=jax.process_index(),
            process_count=jax.process_count())

    def _setup_data(self, graphs):
        cfg = self.cfg
        if cfg.val_path is None or cfg.test_path is None:
            tr, va, te = split_dataset(
                len(graphs), seed=cfg.seed, val_size=cfg.val_size,
                test_size=cfg.test_size,
                train_percentage=cfg.train_percentage)
            self.train_graphs = [graphs[i] for i in tr]
            self.val_graphs = [graphs[i] for i in va]
            self.test_graphs = [graphs[i] for i in te]
        else:
            from ..data.dataset import load_dataset_dir
            self.train_graphs = list(graphs)
            self.val_graphs = load_dataset_dir(
                cfg.val_path, fea_path=cfg.fea_path,
                max_neighbor_number=cfg.max_nbr, target=cfg.target)
            self.test_graphs = load_dataset_dir(
                cfg.test_path, fea_path=cfg.fea_path,
                max_neighbor_number=cfg.max_nbr, target=cfg.target)
        ys = np.asarray([g.target for g in self.train_graphs], np.float64)
        # torch.std default is unbiased (ddof=1), lightning_module.py:124-126
        self.mean = float(ys.mean())
        self.std = float(ys.std(ddof=1)) if len(ys) > 1 else 1.0
        print(f"mean: {self.mean} std: {self.std}")

    # ------------------------------------------------------------- state

    def init_state(self, example_batch: CrystalBatch | None = None,
                   params=None) -> TrainState:
        if example_batch is None:
            example_batch = self._example_batch()
        if params is None:
            # Host-side numpy init (cgat_tpu.models.host_init): same
            # distributions as model.init without compiling/executing the
            # giant init program — which is both slow to compile and, on the
            # axon TPU runtime, degrades all subsequent step dispatches ~20x.
            from ..models.host_init import init_params_host
            params_host = init_params_host(self.model, example_batch,
                                           seed=self.cfg.seed)
            params = jax.tree.map(jnp.asarray, params_host)
        n_params = sum(p.size for p in jax.tree.leaves(params))
        print(f"this model has {n_params:d} parameters")
        self.tx = make_optimizer(self.cfg, params)
        opt_state = self.tx.init(params)
        return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                          opt_state=opt_state)

    def _example_batch(self):
        src = self.train_graphs or self.val_graphs or self.test_graphs
        loader = self._loader(src[: self.cfg.batch_size], shuffle=False)
        return next(iter(loader))

    def _loader(self, graphs, shuffle):
        cfg = self.cfg
        return GraphLoader(graphs, cfg.batch_size, shuffle=shuffle,
                           seed=cfg.seed, max_nbr=cfg.max_nbr,
                           node_bucket=cfg.node_bucket,
                           num_comp_slots=cfg.num_comp_slots)  # None -> loader derives dataset max

    # --------------------------------------------------------------- fit

    def fit(self, state: TrainState | None = None, *,
            epochs: int | None = None, start_epoch: int = 0,
            best_val: float = float("inf"),
            plateau_state: dict | None = None,
            last_val_mae: float | None = None) -> TrainState:
        """Train from ``start_epoch`` (exclusive upper bound ``epochs``).

        ``start_epoch``/``best_val``/``plateau_state`` let ``restore`` resume
        an interrupted run bit-for-bit (the reference restored the full PL
        training state via resume_from_checkpoint, train.py:64-76)."""
        cfg = self.cfg
        epochs = epochs or cfg.epochs
        if state is None:
            state = self.init_state()

        n_dev = cfg.n_devices if cfg.n_devices > 0 else len(jax.devices())
        parallel = n_dev > 1 or cfg.edge_shards > 1
        peval = None
        if parallel:
            # multi-chip path: dp x edge mesh, stacked per-replica batches,
            # XLA SPMD gradient all-reduce (the reference's DDP, train.py:56)
            from ..parallel import (make_mesh, make_parallel_train_step,
                                    replicate)
            mesh = make_mesh(dp=n_dev // cfg.edge_shards,
                             edge=cfg.edge_shards)
            pstep, shard = make_parallel_train_step(
                self.model, self.tx, self.criterion, self.mean, self.std,
                mesh, edge_sharded=cfg.edge_shards > 1,
                dropout=self.model_cfg.dropout > 0, seed=cfg.seed)
            state = replicate(state, mesh)
            train_step = lambda s, b: pstep(s, shard(b))
            train_loader = self._grouped_loader(mesh.shape["dp"],
                                                edge_shards=cfg.edge_shards)
            # validation runs across the mesh too (reference sync_dist
            # metric reduction, lightning_module.py:261-280)
            from ..parallel import make_parallel_eval_step
            peval = make_parallel_eval_step(
                self.model, self.criterion, self.mean, self.std, mesh,
                edge_sharded=cfg.edge_shards > 1)
            n_replicas = mesh.shape["dp"]
        elif cfg.steps_per_dispatch > 1:
            # fuse K steps per dispatch: stacked batches via the same grouped
            # loader the dp path uses, consumed by an unrolled K-step jit
            train_step = make_multi_step(self.model, self.tx, self.criterion,
                                         self.mean, self.std,
                                         dropout=self.model_cfg.dropout > 0,
                                         seed=cfg.seed)
            train_loader = self._grouped_loader(cfg.steps_per_dispatch)
        else:
            train_step = make_train_step(self.model, self.tx, self.criterion,
                                         self.mean, self.std,
                                         dropout=self.model_cfg.dropout > 0,
                                         seed=cfg.seed)
            train_loader = (self._streaming_loader() if cfg.streaming
                            else self._loader(self.train_graphs, shuffle=True))
        # collate ahead of the device: dispatches are synchronous on the
        # axon runtime, so inline collation adds directly to step time
        from ..data.prefetch import PrefetchLoader
        train_loader = PrefetchLoader(train_loader)
        eval_step = make_eval_step(self.model, self.criterion,
                                   self.mean, self.std)
        run_name = cfg.run_name or f"f-{cfg.seed}_t-{time.strftime('%Y-%m-%d_%H-%M-%S')}"
        log_dir = os.path.join(cfg.ckpt_dir, "runs", run_name)
        is_main = jax.process_index() == 0
        logger = MetricsLogger(log_dir, cfg.log_tensorboard, enabled=is_main)
        ckpt = CheckpointManager(log_dir) if is_main else None

        if cfg.clr:
            sched = schedules.cyclical_lr(period=cfg.clr_period,
                                          cycle_mul=0.1, tune_mul=0.05)
            lr_of_epoch = lambda e, _: cfg.learning_rate * sched(e)
            self._plateau = None
        else:
            plateau = schedules.ReduceLROnPlateau()
            if plateau_state:
                plateau.__dict__.update(plateau_state)
            self._plateau = plateau
            lr_of_epoch = lambda e, m: cfg.learning_rate * (
                plateau.step(m) if m is not None else plateau.scale)

        val_mae = last_val_mae
        for epoch in range(start_epoch, epochs):
            train_loader.set_epoch(epoch)
            state = state.replace(opt_state=set_learning_rate(
                state.opt_state, lr_of_epoch(epoch, val_mae)))
            from ..utils.profiling import ThroughputMeter, trace
            meter = ThroughputMeter()
            step_metrics = []
            with trace(os.path.join(log_dir, "profile")
                       if epoch == cfg.profile_epoch else None):
                for batch in train_loader:
                    state, metrics = train_step(state, batch)
                    meter.update(**getattr(train_loader, "last_counts",
                                           {"edges": 0, "graphs": 0}))
                    # defer aggregation: appending device scalars costs no
                    # dispatch; one reduction at epoch end
                    step_metrics.append(metrics)
            nb = len(step_metrics)
            if nb == 0:
                raise RuntimeError("training split smaller than one batch")
            # one stack dispatch + one read per metric for the whole epoch
            train_m = {k: float(jnp.mean(jnp.stack([m[k]
                                                    for m in step_metrics])))
                       for k in step_metrics[0]}
            if cfg.nan_guard and not all(
                    np.isfinite(v) for v in train_m.values()):
                raise FloatingPointError(
                    f"non-finite training metrics at epoch {epoch}: {train_m}")
            logger.log(int(state.step), epoch=epoch,
                       train_loss=train_m["loss"], train_mae=train_m["mae"],
                       train_rmse=train_m["rmse"], **meter.rates())

            if (epoch + 1) % cfg.check_val_every_n_epoch == 0 and self.val_graphs:
                if peval is not None:
                    val_m = self.evaluate_split_parallel(
                        state.params, self.val_graphs, peval, n_replicas)
                else:
                    val_m = self.evaluate_split(state.params, self.val_graphs,
                                                eval_step)
                val_mae = val_m["mae"]
                logger.log(int(state.step), epoch=epoch,
                           val_loss=val_m["loss"], val_mae=val_m["mae"],
                           val_rmse=val_m["rmse"])
                improved = val_mae < best_val
                if improved:
                    best_val = val_mae
                    if ckpt is not None:
                        ckpt.save(state, self, epoch=epoch, val_mae=val_mae,
                                  best_val=best_val)
                # crash-safe "last" for resume (the reference only saved
                # top-1; resume needed an explicit --ckp path). A full save
                # reads the whole train state back over the chip tunnel
                # (~20 s for the flagship), so clone best's files when the
                # two coincide and thin standalone saves by last_ckpt_every.
                if ckpt is not None:
                    if improved:
                        ckpt.clone("best", "last")
                        self._vals_since_last = 0
                    else:
                        self._vals_since_last = getattr(
                            self, "_vals_since_last", 0) + 1
                        if self._vals_since_last >= cfg.last_ckpt_every:
                            ckpt.save(state, self, epoch=epoch,
                                      val_mae=val_mae, tag="last",
                                      best_val=best_val)
                            self._vals_since_last = 0
        self.last_log_dir = log_dir
        return state

    def evaluate_split(self, params, graphs, eval_step=None):
        """Masked-exact metrics over every graph (tail batches padded, not
        dropped — unlike the reference's drop_last val loaders,
        lightning_module.py:382-386, which silently skip the tail)."""
        eval_step = eval_step or make_eval_step(self.model, self.criterion,
                                                self.mean, self.std)
        tot, n = None, 0.0
        loader = self._loader(graphs, shuffle=False)
        loader.drop_last = False
        from ..data.prefetch import PrefetchLoader
        loader = PrefetchLoader(loader)
        for batch in loader:
            m = eval_step(params, batch)
            tot = m if tot is None else jax.tree.map(jnp.add, tot, m)
        if tot is None:
            return {"loss": float("nan"), "mae": float("nan"),
                    "rmse": float("nan")}
        n = float(tot.pop("n"))
        return {k: float(v) / n for k, v in tot.items()}

    def evaluate_split_parallel(self, params, graphs, peval, n_replicas):
        """Masked-exact metrics over every graph, computed across the mesh
        (multi-device equivalent of :meth:`evaluate_split`; the tail group is
        padded with fully masked replica batches, never dropped)."""
        cfg = self.cfg
        from ..parallel import ParallelLoader
        loader = ParallelLoader(graphs, cfg.batch_size, n_replicas,
                                shuffle=False, seed=cfg.seed,
                                max_nbr=cfg.max_nbr,
                                node_bucket=cfg.node_bucket,
                                num_comp_slots=cfg.num_comp_slots,
                                drop_last=False,
                                edge_shards=cfg.edge_shards,
                                process_index=jax.process_index(),
                                process_count=jax.process_count())
        tot = None
        for batch in loader:
            m = peval(params, batch)
            tot = m if tot is None else jax.tree.map(jnp.add, tot, m)
        if tot is None:
            return {"loss": float("nan"), "mae": float("nan"),
                    "rmse": float("nan")}
        n = float(tot.pop("n"))
        return {k: float(v) / n for k, v in tot.items()}

    def predict(self, params, graphs):
        """Denormalised predictions in dataset order (predict.py:10-40).
        Unlike the training loaders this pads the tail batch instead of
        dropping it, so every graph gets a prediction."""
        step = make_predict_step(self.model, self.mean, self.std)
        preds = []
        loader = self._loader(graphs, shuffle=False)
        loader.drop_last = False
        from ..data.prefetch import PrefetchLoader
        loader = PrefetchLoader(loader)
        for batch in loader:
            p, _ = step(params, batch)
            preds.append(np.asarray(p)[np.asarray(batch.graph_mask)])
        return np.concatenate(preds) if preds else np.zeros((0,))

    def embeddings(self, params, graphs):
        """Graph embeddings (calculate_embeddings.py flow)."""
        fn = jax.jit(lambda p, b: self.model.apply(
            {"params": p}, b, return_graph_embedding=True))
        out = []
        loader = self._loader(graphs, shuffle=False)
        loader.drop_last = False
        for batch in loader:
            e = fn(params, batch)
            out.append(np.asarray(e)[np.asarray(batch.graph_mask)])
        return np.concatenate(out) if out else np.zeros((0,))

    def embeddings_parallel(self, params, graphs, n_replicas, mesh=None):
        """Mesh-sharded :meth:`embeddings`: the frozen-backbone embedding
        pass over a large candidate pool runs dp-replicated (and
        edge-partitioned) instead of on one chip — the analogue of the
        reference GP's DDP embedding pass (gaussian_process.py:644-672).
        Single-process meshes (results are gathered to the host)."""
        cfg = self.cfg
        from ..parallel import ParallelLoader, make_mesh
        from ..parallel.trainer import make_parallel_embed_step
        if mesh is None:
            mesh = make_mesh(dp=n_replicas, edge=cfg.edge_shards)
        embed = make_parallel_embed_step(self.model, mesh,
                                         edge_sharded=cfg.edge_shards > 1)
        loader = ParallelLoader(graphs, cfg.batch_size, n_replicas,
                                shuffle=False, seed=cfg.seed,
                                max_nbr=cfg.max_nbr,
                                node_bucket=cfg.node_bucket,
                                num_comp_slots=cfg.num_comp_slots,
                                drop_last=False,
                                edge_shards=cfg.edge_shards)
        out = []
        for batch in loader:
            e = np.asarray(embed(params, batch))           # (D, C, emb)
            mask = np.asarray(batch.graph_mask)            # (D, C)
            for d in range(e.shape[0]):
                out.append(e[d][mask[d]])
        return np.concatenate(out) if out else np.zeros((0,))


class CheckpointManager:
    """Orbax-backed top-1 checkpointing (reference ModelCheckpoint on
    val_mae, train.py:42-48) + hyperparameter persistence for
    ``Trainer.load``-style reconstruction (lightning_module.py:413-424)."""

    def __init__(self, log_dir: str):
        self.dir = os.path.abspath(os.path.join(log_dir, "checkpoints"))
        os.makedirs(self.dir, exist_ok=True)

    def save(self, state: TrainState, trainer: Trainer, *, epoch: int,
             val_mae: float, tag: str = "best",
             best_val: float | None = None):
        import orbax.checkpoint as ocp
        path = os.path.join(self.dir, tag)

        def to_host(x):
            # multi-process: replicated global arrays are not fully
            # addressable; snapshot the local copy so rank 0 can write alone
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return np.asarray(x.addressable_shards[0].data)
            return x

        with ocp.PyTreeCheckpointer() as ckptr:
            # full training state: params + optimizer moments + step, so a
            # resumed run reproduces the uninterrupted one (the reference's
            # resume_from_checkpoint restored optimizer + schedule,
            # train.py:64-76)
            ckptr.save(path, jax.tree.map(to_host,
                                          {"params": state.params,
                                           "step": state.step,
                                           "opt_state": state.opt_state}),
                       force=True)
        plateau = getattr(trainer, "_plateau", None)
        meta = {
            "epoch": epoch, "val_mae": float(val_mae),
            "best_val": float(best_val if best_val is not None else val_mae),
            "plateau": dict(plateau.__dict__) if plateau is not None else None,
            "mean": trainer.mean, "std": trainer.std,
            "trainer_config": dataclasses.asdict(trainer.cfg),
            "model_config": dataclasses.asdict(trainer.model_cfg),
        }
        with open(os.path.join(self.dir, f"{tag}.json"), "w") as f:
            json.dump(meta, f, indent=2, default=str)

    def clone(self, src_tag: str, dst_tag: str):
        """Duplicate an on-disk checkpoint under another tag (host-side file
        copy — no device readback). Used when 'best' and 'last' coincide:
        a full save costs ~20 s of D2H over the chip tunnel."""
        import shutil
        src = os.path.join(self.dir, src_tag)
        dst = os.path.join(self.dir, dst_tag)
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        shutil.copytree(src, dst)
        shutil.copyfile(os.path.join(self.dir, f"{src_tag}.json"),
                        os.path.join(self.dir, f"{dst_tag}.json"))

    @staticmethod
    def _resolve(ckpt_dir: str) -> str:
        d = ckpt_dir
        if os.path.isdir(os.path.join(d, "checkpoints")):
            d = os.path.join(d, "checkpoints")
        return os.path.abspath(d)  # orbax rejects relative restore paths

    @staticmethod
    def load(ckpt_dir: str, tag: str = "best"):
        """Returns (params, meta). ``ckpt_dir`` is .../checkpoints or the
        run dir containing it; ``tag`` selects best|last."""
        import orbax.checkpoint as ocp
        d = CheckpointManager._resolve(ckpt_dir)
        with open(os.path.join(d, f"{tag}.json")) as f:
            meta = json.load(f)
        path = os.path.join(d, tag)
        with ocp.PyTreeCheckpointer() as ckptr:
            # restore as HOST numpy arrays: restoring as jax.Arrays needs
            # the saved sharding to resolve in THIS process, which fails
            # when the restoring process's device topology differs from
            # the saving one (e.g. train on TPU, cgat-export/predict in a
            # fresh CPU process). Device placement happens lazily on first
            # use instead.
            mtree = ckptr.metadata(path)
            mtree = getattr(mtree, "item_metadata", mtree)
            args = jax.tree.map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), mtree)
            tree = ckptr.restore(path, restore_args=args)
        return tree["params"], meta

    @staticmethod
    def load_state(ckpt_dir: str, template: TrainState,
                   tag: str = "last") -> TrainState:
        """Restore the FULL train state (params + step + optimizer moments)
        into the structure of ``template`` (a freshly built TrainState, so
        optax NamedTuples round-trip orbax's dict serialisation)."""
        import orbax.checkpoint as ocp
        d = CheckpointManager._resolve(ckpt_dir)
        item = {"params": template.params, "step": template.step,
                "opt_state": template.opt_state}
        # numpy restore for cross-process safety (see load()); the template
        # supplies the pytree structure so optax NamedTuples round-trip
        args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), item)
        with ocp.PyTreeCheckpointer() as ckptr:
            tree = ckptr.restore(os.path.join(d, tag), item=item,
                                 restore_args=args)
        return template.replace(params=tree["params"], step=tree["step"],
                                opt_state=tree["opt_state"])


def load_trainer(run_dir: str, *, train: bool = False, graphs=None,
                 tag: str = "best", **overrides):
    """Rebuild a Trainer + params from a checkpoint
    (LightningModel.load, lightning_module.py:413-424). ``overrides`` are
    TrainerConfig field replacements (e.g. a new ckpt_dir for a resumed run)."""
    params, meta = CheckpointManager.load(run_dir, tag=tag)
    tcfg_d = dict(meta["trainer_config"])
    tcfg_d.update(overrides)
    # dataclass roundtrip may stringify None
    tcfg = TrainerConfig(**{k: (None if v == "None" else v)
                            for k, v in tcfg_d.items()
                            if k in TrainerConfig.__dataclass_fields__})
    mcfg_d = meta["model_config"]
    mcfg_d["out_hidden"] = tuple(mcfg_d.get("out_hidden", ()))
    mcfg = CGATConfig(**{k: v for k, v in mcfg_d.items()
                         if k in CGATConfig.__dataclass_fields__})
    if train and graphs is None:
        from ..data.dataset import load_dataset_dir
        graphs = load_dataset_dir(tcfg.data_path, fea_path=tcfg.fea_path,
                                  max_neighbor_number=tcfg.max_nbr,
                                  target=tcfg.target)
    trainer = Trainer(tcfg, mcfg, graphs, mean=meta["mean"], std=meta["std"])
    # the stored normalisation always wins (persisted like the reference's
    # non-grad mean/std Parameters, lightning_module.py:44-46)
    trainer.mean, trainer.std = meta["mean"], meta["std"]
    return trainer, params, meta


def resume_trainer(run_dir: str, *, graphs=None, tag: str = "last",
                   **overrides):
    """Rebuild a Trainer + FULL TrainState for exact resume.

    Returns ``(trainer, state, meta)``; continue with
    ``trainer.fit(state, start_epoch=meta['epoch'] + 1,
    best_val=meta['best_val'], plateau_state=meta['plateau'],
    last_val_mae=meta['val_mae'])`` — reproduces the uninterrupted run
    (reference resume_from_checkpoint, train.py:64-76)."""
    trainer, params, meta = load_trainer(run_dir, train=graphs is None,
                                         graphs=graphs, tag=tag, **overrides)
    template = trainer.init_state(params=params)
    try:
        state = CheckpointManager.load_state(run_dir, template, tag=tag)
    except Exception as e:  # pre-round-2 checkpoint without opt_state
        print(f"warm-start resume (no stored optimizer state: {e})")
        state = template
    return trainer, state, meta
