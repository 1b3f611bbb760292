"""Multi-chip train/eval steps over a ('dp', 'edge') mesh via shard_map.

Each mesh cell runs the PLAIN single-device model on its local data — no
vmap, so the fused Pallas kernel executes per-shard exactly as it does on one
chip. The ``dp`` axis carries whole replicas (the reference's DDP,
train.py:56); the ``edge`` axis partitions each replica's node and edge
arrays (collated with ``edge_shards`` so every edge block's destinations lie
in the matching node slice): per-edge tensors and per-node hypernetwork
weights shrink by the shard count, aggregation is purely local, and only
BOUNDARY node features cross the ICI at layer boundaries (static halo
``all_to_all``, comm ∝ partition boundary — models/cgat.py). Atom pooling
runs on each cell's local atoms with (C, H, F)-sized collectives completing
the per-crystal softmax; only the tiny composition/output tail (C rows) is
replicated. The loss is divided by the edge-axis size so the ``psum`` over
('dp','edge') yields exact global gradients — identical to the
single-device computation on the concatenated batch (tested in
test_parallel.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..data.batching import CrystalBatch
from ..data.dataset import GraphLoader
from ..models.cgat import CGAtNet
from ..training.trainer import TrainState, project_params
from .distributed import make_batch_sharder
from .sharding import shardmap_batch_pspecs, stack_batches


def _cell_sums(out, batch, mean, std, criterion):
    """Masked metric SUMS for one replica's (C, 2) outputs."""
    output, log_std = out[:, 0], out[:, 1]
    target, mask = batch.target, batch.graph_mask
    maskf = mask.astype(jnp.float32)
    n = jnp.sum(maskf)
    target_norm = (target - mean) / std
    loss_sum = criterion(output, log_std, target_norm, mask) * n
    pred = output * std + mean
    err = jnp.where(mask, pred - target, 0.0)
    sae = jnp.sum(jnp.abs(err))
    sse = jnp.sum(err * err)
    return loss_sum, sae, sse, n


def _global_loss_and_metrics(params, batch, model, criterion, mean, std,
                             edge_axis, n_edge_shards, rngs):
    """Globally psum'd masked-mean loss + metrics, computed inside the
    shard_map body. Differentiating this scalar gives each cell its exact
    partial gradient (collective transposes carry the cross-cell cotangents);
    psum of those partials is the full global gradient."""
    kwargs = {"edge_axis": edge_axis} if edge_axis else {}
    if rngs is not None:
        out = model.apply({"params": params}, batch, deterministic=False,
                          rngs=rngs, **kwargs)
    else:
        out = model.apply({"params": params}, batch, **kwargs)
    loss_sum, sae, sse, n = _cell_sums(out, batch, mean, std, criterion)
    axes = ("dp", "edge")
    S = float(n_edge_shards)
    gcount = jax.lax.psum(jax.lax.stop_gradient(n) / S, axes)
    loss = jax.lax.psum(loss_sum / S, axes) / gcount
    mae = jax.lax.psum(sae / S, axes) / gcount
    rmse = jnp.sqrt(jax.lax.psum(sse / S, axes) / gcount)
    return loss, {"loss": loss, "mae": mae, "rmse": rmse}


def _squeeze_dp(batch):
    return jax.tree.map(lambda x: x[0], batch)


def make_parallel_train_step(model: CGAtNet, tx, criterion, mean, std,
                             mesh: Mesh, *, edge_sharded: bool = True,
                             donate: bool = True, dropout: bool = False,
                             seed: int = 0):
    """Returns (step_fn, shard_batch_fn). ``step_fn(state, stacked_batch)``.

    ``edge_sharded`` batches must come from a loader/collate with
    ``edge_shards == mesh.shape['edge']``."""
    S = mesh.shape["edge"]
    edge_axis = "edge" if (edge_sharded and S > 1) else None
    pspecs = shardmap_batch_pspecs(edge_axis is not None)
    shard_batch = make_batch_sharder(mesh, pspecs)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), pspecs), out_specs=(P(), P()), check_vma=False)
    def step_fn(state: TrainState, batch: CrystalBatch):
        local = _squeeze_dp(batch)

        def loss_fn(params):
            rngs = None
            if dropout:
                k = jax.random.fold_in(jax.random.key(seed), state.step)
                k = jax.random.fold_in(k, jax.lax.axis_index("dp"))
                rngs = {"dropout": jax.random.fold_in(
                    k, jax.lax.axis_index("edge"))}
            return _global_loss_and_metrics(
                params, local, model, criterion, mean, std, edge_axis,
                S if edge_axis else 1, rngs)

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grads = jax.lax.psum(grads, ("dp", "edge"))
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = project_params(optax.apply_updates(state.params, updates))
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), metrics

    jitted = jax.jit(step_fn, donate_argnums=(0,) if donate else ())
    return jitted, shard_batch


def make_parallel_eval_step(model: CGAtNet, criterion, mean, std, mesh: Mesh,
                            *, edge_sharded: bool = True):
    S = mesh.shape["edge"]
    edge_axis = "edge" if (edge_sharded and S > 1) else None
    pspecs = shardmap_batch_pspecs(edge_axis is not None)
    shard_batch = make_batch_sharder(mesh, pspecs)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), pspecs), out_specs=P(), check_vma=False)
    def step_fn(params, batch: CrystalBatch):
        local = _squeeze_dp(batch)
        kwargs = {"edge_axis": edge_axis} if edge_axis else {}
        out = model.apply({"params": params}, local, **kwargs)
        loss_sum, sae, sse, n = _cell_sums(out, local, mean, std, criterion)
        Sf = float(S if edge_axis else 1)
        axes = ("dp", "edge")
        n_g = jax.lax.psum(n / Sf, axes)
        sums = {"loss": jax.lax.psum(loss_sum / Sf, axes),
                "mae": jax.lax.psum(sae / Sf, axes),
                # rmse aggregated like evaluate_split: per-call sqrt of the
                # global mean, scaled back to a sum
                "rmse": jnp.sqrt(jax.lax.psum(sse / Sf, axes)
                                 / jnp.maximum(n_g, 1.0)) * n_g}
        return sums | {"n": n_g}

    jitted = jax.jit(step_fn)

    def eval_fn(params, batch):
        return jitted(params, shard_batch(batch))

    return eval_fn


def make_parallel_embed_step(model: CGAtNet, mesh: Mesh, *,
                             edge_sharded: bool = True):
    """Sharded graph-embedding forward for GP / active-learning ranking.

    The reference trains its GP under DDP (gaussian_process.py:644-672) so
    the frozen-backbone embedding pass scales with the pool; this is the
    mesh equivalent: each dp row embeds its own replica batch (edge cells
    partition the message passing as in training). Returns
    ``embed(params, stacked_batch) -> (D, C, embedding_dim)``.
    """
    S = mesh.shape["edge"]
    edge_axis = "edge" if (edge_sharded and S > 1) else None
    pspecs = shardmap_batch_pspecs(edge_axis is not None)
    shard_batch = make_batch_sharder(mesh, pspecs)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), pspecs), out_specs=P("dp"), check_vma=False)
    def fn(params, batch: CrystalBatch):
        local = _squeeze_dp(batch)
        kwargs = {"edge_axis": edge_axis} if edge_axis else {}
        emb = model.apply({"params": params}, local,
                          return_graph_embedding=True, **kwargs)
        return emb[None]

    jitted = jax.jit(fn)

    def embed(params, stacked):
        return jitted(params, shard_batch(stacked))

    return embed


class StreamingParallelLoader:
    """Stacked-group loader over an out-of-core shard stream.

    Composes :class:`cgat_tpu.data.streaming.StreamingGraphLoader` (one shard
    in host memory, background prefetch, resume-stable per-epoch order) with
    the stacked-group collation the mesh paths consume: D consecutive
    minibatches become one stacked batch with group-wide pad dims.

    Multi-host: every process streams ALL shards in the same deterministic
    order (so the group-wide pad dims agree) but collates only its own
    ``D / process_count`` replica rows — the same host-side split
    ParallelLoader does. The stream itself must NOT be shard-sliced here.
    """

    def __init__(self, stream, n_replicas: int, *, edge_shards: int = 1,
                 process_index: int = 0, process_count: int = 1):
        if n_replicas % process_count:
            raise ValueError(f"n_replicas={n_replicas} not divisible by "
                             f"process_count={process_count}")
        self.stream = stream
        self.n_replicas = n_replicas
        self.edge_shards = edge_shards
        self.process_index = process_index
        self.process_count = process_count

    def __len__(self):
        return len(self.stream) // self.n_replicas

    def set_epoch(self, epoch: int) -> None:
        self.stream.set_epoch(epoch)

    def __iter__(self):
        st = self.stream
        bs = st.batch_size
        D = self.n_replicas
        carry, group = [], []
        for graphs in st._shards():
            carry.extend(graphs)
            while len(carry) >= bs:
                group.append(carry[:bs])
                carry = carry[bs:]
                if len(group) == D:
                    self.last_counts = {
                        "edges": sum(len(x.edge_src)
                                     for c in group for x in c),
                        "graphs": sum(len(c) for c in group)}
                    yield collate_group(
                        group, batch_size=bs, max_nbr=st.max_nbr,
                        node_bucket=st.node_bucket,
                        num_comp_slots=st.num_comp_slots,
                        max_degree=st.max_degree,
                        edge_shards=self.edge_shards,
                        process_index=self.process_index,
                        process_count=self.process_count)
                    group = []
        # tail partial group dropped (training loaders are drop_last)


def collate_group(chunks, *, batch_size, max_nbr, node_bucket,
                  num_comp_slots, max_degree=None, edge_shards=1,
                  process_index=0, process_count=1):
    """Collate D replica chunks into one stacked batch with GROUP-wide pad
    dims (identical in every process; only this process's replica rows are
    actually collated). Shared by ParallelLoader and the streaming variant."""
    from ..data.batching import collate, pad_to_bucket
    D = len(chunks)
    S = edge_shards
    n_max = max(pad_to_bucket(sum(x.n_atoms for x in c), node_bucket)
                for c in chunks)
    if S > 1 and n_max % S:
        n_max += S - n_max % S
    # pin the feature width so empty tail chunks (drop_last=False) collate
    # to the same shape as the real ones
    fea = next((c[0].atom_fea.shape[1] for c in chunks if c), None)
    cap = cap_h = halo = None
    if S > 1:
        from ..data.batching import edge_shard_counts, halo_pair_max
        splits = [edge_shard_counts(c, n_max, S) for c in chunks]
        cap = pad_to_bucket(max(max(int(l.max()) for l, _ in splits), 1),
                            8 * max_nbr)
        cap_h = pad_to_bucket(max(max(int(h.max()) for _, h in splits), 1),
                              16)
        halo = max(8, pad_to_bucket(
            max(halo_pair_max(c, n_max, S) for c in chunks), 8))
    d_local = D // process_count
    local = chunks[process_index * d_local:(process_index + 1) * d_local]
    batches = [collate(c, max_nbr=max_nbr, num_graphs=batch_size,
                       num_comp_slots=num_comp_slots,
                       num_node_slots=n_max, orig_fea=fea,
                       edge_shards=S, edge_slots_per_shard=cap,
                       halo_edge_slots=cap_h, halo_slots=halo,
                       max_degree=(max_degree if S == 1 else None))
               for c in local]
    return stack_batches(batches)


class ParallelLoader:
    """Groups D consecutive minibatches into one stacked batch.

    All members of a group are padded to the same node-slot count so shapes
    line up across the stack (the group's max bucket). With
    ``edge_shards > 1`` every member is collated in the dst-blocked layout
    (see ``cgat_tpu.data.batching.collate``) with a shared per-shard edge
    capacity so the stacked group shards cleanly over the ``edge`` axis.

    Multi-host: pass ``process_index``/``process_count`` (usually
    ``jax.process_index()``/``jax.process_count()``). Every process computes
    the same deterministic order and the same group-wide pad dims (cheap,
    graph metadata only) but collates ONLY its own ``D / process_count``
    replica chunks — the dp rows owned by its local chips — and yields that
    local stack; ``make_batch_sharder`` globalises it. The reference's
    per-rank DistributedSampler split, done host-side (train.py:100-104)."""

    def __init__(self, graphs, batch_size: int, n_replicas: int, *,
                 shuffle=False, seed=0, max_nbr=24, node_bucket=64,
                 num_comp_slots=None, drop_last=True, edge_shards=1,
                 process_index=0, process_count=1):
        self.inner = GraphLoader(graphs, batch_size, shuffle=shuffle,
                                 seed=seed, max_nbr=max_nbr,
                                 node_bucket=node_bucket,
                                 num_comp_slots=num_comp_slots,
                                 drop_last=drop_last)
        self.n_replicas = n_replicas
        self.max_nbr = max_nbr
        self.node_bucket = node_bucket
        self.drop_last = drop_last
        self.edge_shards = edge_shards
        if n_replicas % process_count:
            raise ValueError(f"n_replicas={n_replicas} not divisible by "
                             f"process_count={process_count}")
        self.process_index = process_index
        self.process_count = process_count

    def __len__(self):
        if self.drop_last:
            return len(self.inner) // self.n_replicas
        # pad the tail group with empty (fully masked) replica batches so
        # every graph is evaluated exactly once (masked-exact parallel eval)
        return -(-len(self.inner) // self.n_replicas)

    def set_epoch(self, epoch: int) -> None:
        self.inner.set_epoch(epoch)

    def __iter__(self):
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
            self.last_counts = {
                "edges": sum(len(x.edge_src) for c in chunks for x in c),
                "graphs": sum(len(c) for c in chunks)}
            yield collate_group(chunks, batch_size=bs, max_nbr=self.max_nbr,
                                node_bucket=self.node_bucket,
                                num_comp_slots=inner.num_comp_slots,
                                max_degree=inner.max_degree,
                                edge_shards=self.edge_shards,
                                process_index=self.process_index,
                                process_count=self.process_count)
