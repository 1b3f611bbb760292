"""Multi-chip train/eval steps over a ('dp', 'edge') mesh.

The model is vmapped over the stacked replica axis; jit + sharding
annotations let the XLA SPMD partitioner place each replica's compute on its
``dp`` device and partition the per-edge work over ``edge``, inserting the
gradient all-reduce that DDP/NCCL provided in the reference (train.py:56) and
the boundary-node reductions for the edge partition. Loss and metrics are
globally masked-exact: per-graph losses are summed across every replica and
divided by the global graph count, so gradients equal the single-device
computation on the concatenated batch.
"""
from __future__ import annotations



import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.batching import CrystalBatch
from ..data.dataset import GraphLoader
from ..models.cgat import CGAtNet
from ..training import losses as L
from ..training.trainer import TrainState
from .sharding import batch_shardings, stack_batches


def _global_metrics(out, batch, mean, std, criterion):
    """out: (D, C, 2) stacked model outputs."""
    output, log_std = out[..., 0], out[..., 1]
    target, mask = batch.target, batch.graph_mask
    target_norm = (target - mean) / std
    loss = criterion(output, log_std, target_norm, mask)
    pred = output * std + mean
    mae = L.l1(pred, target, mask)
    rmse = jnp.sqrt(L.mse(pred, target, mask))
    return loss, {"loss": loss, "mae": mae, "rmse": rmse}


def make_parallel_train_step(model: CGAtNet, tx, criterion, mean, std,
                             mesh: Mesh, *, edge_sharded: bool = True,
                             donate: bool = True, dropout: bool = False,
                             seed: int = 0):
    """Returns (step_fn, shard_batch_fn). ``step_fn(state, stacked_batch)``."""
    repl = NamedSharding(mesh, P())
    in_sh = batch_shardings(mesh, edge_sharded)
    n_replicas = mesh.shape["dp"]

    def step_fn(state: TrainState, batch: CrystalBatch):
        def loss_fn(params):
            if dropout:
                keys = jax.random.split(jax.random.fold_in(
                    jax.random.key(seed), state.step), n_replicas)
                out = jax.vmap(lambda b, k: model.apply(
                    {"params": params}, b, deterministic=False,
                    rngs={"dropout": k}))(batch, keys)
            else:
                out = jax.vmap(
                    lambda b: model.apply({"params": params}, b))(batch)
            return _global_metrics(out, batch, mean, std, criterion)

        (loss, metrics), grads = jax.value_and_grad(
            lambda p: loss_fn(p), has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), metrics

    jitted = jax.jit(step_fn,
                     in_shardings=(repl, in_sh),
                     out_shardings=(repl, repl),
                     donate_argnums=(0,) if donate else ())

    def shard_batch(batch):
        return jax.device_put(batch, in_sh)

    return jitted, shard_batch


def make_parallel_eval_step(model: CGAtNet, criterion, mean, std, mesh: Mesh,
                            *, edge_sharded: bool = True):
    repl = NamedSharding(mesh, P())
    in_sh = batch_shardings(mesh, edge_sharded)

    def step_fn(params, batch: CrystalBatch):
        out = jax.vmap(lambda b: model.apply({"params": params}, b))(batch)
        _, m = _global_metrics(out, batch, mean, std, criterion)
        n = jnp.sum(batch.graph_mask.astype(jnp.float32))
        return {k: v * n for k, v in m.items()} | {"n": n}

    return jax.jit(step_fn, in_shardings=(repl, in_sh), out_shardings=repl)


class ParallelLoader:
    """Groups D consecutive minibatches into one stacked batch.

    All members of a group are padded to the same node-slot count so shapes
    line up across the stack (the group's max bucket)."""

    def __init__(self, graphs, batch_size: int, n_replicas: int, *,
                 shuffle=False, seed=0, max_nbr=24, node_bucket=64,
                 num_comp_slots=None, drop_last=True):
        self.inner = GraphLoader(graphs, batch_size, shuffle=shuffle,
                                 seed=seed, max_nbr=max_nbr,
                                 node_bucket=node_bucket,
                                 num_comp_slots=num_comp_slots,
                                 drop_last=drop_last)
        self.n_replicas = n_replicas
        self.max_nbr = max_nbr
        self.node_bucket = node_bucket
        self.drop_last = drop_last

    def __len__(self):
        if self.drop_last:
            return len(self.inner) // self.n_replicas
        # pad the tail group with empty (fully masked) replica batches so
        # every graph is evaluated exactly once (masked-exact parallel eval)
        return -(-len(self.inner) // self.n_replicas)

    def set_epoch(self, epoch: int) -> None:
        self.inner.set_epoch(epoch)

    def __iter__(self):
        from ..data.batching import collate, pad_to_bucket
        D = self.n_replicas
        inner = self.inner
        inner.drop_last = self.drop_last
        order_graphs = inner.graphs
        order = inner._order()
        bs = inner.batch_size
        for g in range(len(self)):
            chunks = []
            for d in range(D):
                idx = order[(g * D + d) * bs:(g * D + d + 1) * bs]
                chunks.append([order_graphs[i] for i in idx])
            n_max = max(pad_to_bucket(sum(x.n_atoms for x in c),
                                      self.node_bucket) for c in chunks)
            self.last_counts = {
                "edges": sum(len(x.edge_src) for c in chunks for x in c),
                "graphs": sum(len(c) for c in chunks)}
            # pin the feature width so empty tail chunks (drop_last=False)
            # collate to the same shape as the real ones
            fea = next((c[0].atom_fea.shape[1] for c in chunks if c), None)
            batches = [collate(c, max_nbr=self.max_nbr,
                               num_graphs=bs,
                               num_comp_slots=inner.num_comp_slots,
                               num_node_slots=n_max, orig_fea=fea)
                       for c in chunks]
            yield stack_batches(batches)
