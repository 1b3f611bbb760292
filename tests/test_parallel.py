"""Multi-chip tests on a virtual 8-device CPU mesh: DP + edge sharding."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cgat_tpu.data import collate
from cgat_tpu.data.synthetic import random_graphs
from cgat_tpu.models import CGATConfig, CGAtNet
from cgat_tpu.parallel import (
    ParallelLoader, make_mesh, make_parallel_train_step, replicate,
    shard_stacked_batch, stack_batches,
)
from cgat_tpu.training import TrainerConfig, losses, make_optimizer
from cgat_tpu.training.trainer import TrainState, make_train_step

TINY = dict(orig_elem_fea_len=12, elem_fea_len=8, n_graph=2,
            nbr_embedding_size=8, neighbor_number=4, msg_heads=2,
            n_graph_roost=1, out_hidden=(8,))


def setup(n_graphs=16, batch=4):
    cfg = CGATConfig(**TINY)
    graphs = random_graphs(0, n_graphs, n_atoms_range=(3, 6), max_nbr=4,
                           orig_fea=12)
    model = CGAtNet(cfg)
    b0 = collate(graphs[:batch], max_nbr=4, node_bucket=8)
    params = model.init(jax.random.key(0), b0)["params"]
    return cfg, graphs, model, params


def test_mesh_shapes():
    mesh = make_mesh(dp=4, edge=2)
    assert mesh.shape == {"dp": 4, "edge": 2}
    with pytest.raises(ValueError):
        make_mesh(dp=16, edge=1)


def test_dp_matches_single_device():
    """Parallel gradients must equal single-device gradients on the same
    graphs (DDP parity)."""
    cfg, graphs, model, params = setup()
    tcfg = TrainerConfig(optim="AdamW", learning_rate=1e-3)
    criterion = losses.make_loss("L1", False)
    mean, std = 0.1, 1.3

    mesh = make_mesh(dp=4, edge=2)
    tx = make_optimizer(tcfg)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    pstep, shard = make_parallel_train_step(model, tx, criterion, mean, std,
                                            mesh, donate=False)
    loader = ParallelLoader(graphs, 4, 4, max_nbr=4, node_bucket=8,
                            num_comp_slots=8, edge_shards=2)
    stacked = next(iter(loader))
    state_p = replicate(state, mesh)
    new_state, metrics = pstep(state_p, shard(stacked))

    # single-device oracle: same four sub-batches, global masked mean loss
    tx2 = make_optimizer(tcfg)
    state_s = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                         opt_state=tx2.init(params))

    def loss_fn(p):
        outs = [model.apply({"params": p},
                            jax.tree.map(lambda x: x[d], stacked))
                for d in range(4)]
        out = jnp.stack(outs)
        output, log_std = out[..., 0], out[..., 1]
        tn = (stacked.target - mean) / std
        return criterion(output, log_std, tn, stacked.graph_mask)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(metrics["loss"]), float(loss),
                               rtol=1e-5, atol=1e-6)
    upd, _ = tx2.update(grads, state_s.opt_state, params)
    import optax
    want_params = optax.apply_updates(params, upd)
    got = jax.tree.map(np.asarray, new_state.params)
    want = jax.tree.map(np.asarray, want_params)
    # the loss comparison above is the exact check; one AdamW step divides
    # float-level grad noise by sqrt(v) ~ |g|, amplifying it to O(lr) in the
    # params — compare with an lr-scale absolute tolerance
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(g, w, rtol=1e-2, atol=1e-3)


def test_edge_sharding_preserves_forward():
    """Edge-partitioned forward == unsharded forward (boundary reductions
    inserted by the SPMD partitioner must be exact)."""
    cfg, graphs, model, params = setup()
    mesh = make_mesh(dp=2, edge=4)
    batches = [collate(graphs[i * 4:(i + 1) * 4], max_nbr=4, node_bucket=8,
                       num_node_slots=32, num_comp_slots=8, max_degree=4)
               for i in range(2)]
    stacked = stack_batches(batches)
    want = np.stack([
        np.asarray(model.apply({"params": params}, b)) for b in batches])

    sharded = shard_stacked_batch(stacked, mesh, edge_sharded=True)
    params_r = replicate(params, mesh)
    fn = jax.jit(lambda p, b: jax.vmap(
        lambda x: model.apply({"params": p}, x))(b))
    got = np.asarray(fn(params_r, sharded))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_parallel_loader_group_shapes():
    _, graphs, _, _ = setup(n_graphs=20)
    loader = ParallelLoader(graphs, 2, 4, max_nbr=4, node_bucket=8,
                            num_comp_slots=8)
    assert len(loader) == 2
    for stacked in loader:
        assert stacked.nodes.shape[0] == 4
        assert stacked.target.shape == (4, 2)


def test_edge_sharded_collate_layout():
    """Split blocked layout: local block s holds exactly the edges with BOTH
    endpoints in node slice s, halo block s those with dst in slice s and a
    remote source; each sub-block dst-sorted, suffix-padded; the union is the
    plain collate's real edge set."""
    graphs = random_graphs(3, 6, n_atoms_range=(3, 6), max_nbr=4,
                           orig_fea=12)
    b = collate(graphs, max_nbr=4, node_bucket=8, edge_shards=4)
    N = b.nodes.shape[0]
    E = b.edge_src.shape[0]
    Eh = b.halo_src.shape[0]
    assert N % 4 == 0 and E % 4 == 0 and Eh % 4 == 0
    n_loc, cap, cap_h = N // 4, E // 4, Eh // 4
    for arrs, local in (((b.edge_src, b.edge_dst, b.edge_mask), True),
                        ((b.halo_src, b.halo_dst, b.halo_mask), False)):
        src, dst, mask = map(np.asarray, arrs)
        c = cap if local else cap_h
        for s in range(4):
            blk = slice(s * c, (s + 1) * c)
            sr, d, m = src[blk], dst[blk], mask[blk]
            assert np.all((d >= s * n_loc) & (d < (s + 1) * n_loc))
            assert np.all(np.diff(d[m]) >= 0)        # sorted within block
            if not m.all():
                assert not m[np.argmin(m):].any()    # False-suffix
            owner = sr[m] // n_loc
            assert np.all(owner == s) if local else np.all(owner != s)
    # union of both blocks == real edges of the unsharded layout
    b1 = collate(graphs, max_nbr=4, node_bucket=8)
    def real(src, dst, mask):
        src, dst, mask = map(np.asarray, (src, dst, mask))
        return list(zip(src[mask], dst[mask]))
    got = sorted(real(b.edge_src, b.edge_dst, b.edge_mask)
                 + real(b.halo_src, b.halo_dst, b.halo_mask))
    assert got == sorted(real(b1.edge_src, b1.edge_dst, b1.edge_mask))


def test_edge_sharded_shardmap_matches_single_device():
    """The REAL edge-partitioned path: node+edge arrays sharded over 'edge',
    all_gather at layer boundaries, local aggregation — one full train step
    must match the single-device step on the same graphs."""
    import optax
    cfg, graphs, model, params = setup(n_graphs=8)
    tcfg = TrainerConfig(optim="AdamW", learning_rate=1e-3)
    criterion = losses.make_loss("L1", False)
    mean, std = 0.1, 1.3
    mesh = make_mesh(dp=2, edge=4)
    tx = make_optimizer(tcfg)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    pstep, shard = make_parallel_train_step(model, tx, criterion, mean, std,
                                            mesh, edge_sharded=True,
                                            donate=False)
    loader = ParallelLoader(graphs, 4, 2, max_nbr=4, node_bucket=8,
                            num_comp_slots=8, edge_shards=4)
    stacked = next(iter(loader))
    state_p = replicate(state, mesh)
    new_state, metrics = pstep(state_p, shard(stacked))

    def loss_fn(p):
        outs = [model.apply({"params": p},
                            jax.tree.map(lambda x: x[d], stacked))
                for d in range(2)]
        out = jnp.stack(outs)
        output, log_std = out[..., 0], out[..., 1]
        tn = (stacked.target - mean) / std
        return criterion(output, log_std, tn, stacked.graph_mask)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(metrics["loss"]), float(loss),
                               rtol=1e-5, atol=1e-6)
    tx2 = make_optimizer(tcfg)
    upd, _ = tx2.update(grads, tx2.init(params), params)
    want = jax.tree.map(np.asarray, optax.apply_updates(params, upd))
    got = jax.tree.map(np.asarray, new_state.params)
    # early AdamW steps normalise float-level grad noise to O(lr); compare
    # with an lr-scale absolute tolerance (same as the multi-step test)
    for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
        np.testing.assert_allclose(g, w, rtol=1e-2, atol=1e-3)


def test_pallas_backend_under_mesh_matches_xla():
    """The fused Pallas kernel (interpret mode on CPU) inside the shard_map
    body: full edge-sharded train step equals the XLA-backend step."""
    from cgat_tpu.ops import attention as att
    big = dict(TINY, elem_fea_len=64, nbr_embedding_size=64)  # heads*fea=128
    cfg = CGATConfig(**big)
    graphs = random_graphs(7, 4, n_atoms_range=(4, 7), max_nbr=4,
                           orig_fea=12)
    model = CGAtNet(cfg)
    b0 = collate(graphs[:2], max_nbr=4, node_bucket=8)
    params = model.init(jax.random.key(0), b0)["params"]
    tcfg = TrainerConfig(optim="AdamW", learning_rate=1e-3)
    criterion = losses.make_loss("L1", False)
    mesh = make_mesh(dp=2, edge=2)
    loader = ParallelLoader(graphs, 2, 2, max_nbr=4, node_bucket=8,
                            num_comp_slots=8, edge_shards=2)
    stacked = next(iter(loader))

    results = {}
    for backend in ("xla", "pallas"):
        att.set_backend(backend)
        try:
            tx = make_optimizer(tcfg)
            state = replicate(TrainState(step=jnp.zeros((), jnp.int32),
                                         params=params,
                                         opt_state=tx.init(params)), mesh)
            pstep, shard = make_parallel_train_step(
                model, tx, criterion, 0.0, 1.0, mesh, edge_sharded=True,
                donate=False)
            new_state, m = pstep(state, shard(stacked))
            results[backend] = (jax.tree.map(np.asarray, new_state.params),
                                float(m["loss"]))
        finally:
            att.set_backend("xla")
    np.testing.assert_allclose(results["pallas"][1], results["xla"][1],
                               rtol=1e-5)
    # kernel-level parity is tested tightly in test_pallas_kernels; here a
    # full AdamW step amplifies float noise to O(lr) (see comment above)
    for a, b in zip(jax.tree.leaves(results["pallas"][0]),
                    jax.tree.leaves(results["xla"][0])):
        np.testing.assert_allclose(a, b, rtol=1e-2, atol=1e-3)


def test_parallel_eval_matches_single_device():
    """Mesh evaluation == single-device evaluation, including a padded tail
    group (21 graphs, batch 2 x 4 replicas)."""
    from cgat_tpu.parallel import make_parallel_eval_step
    from cgat_tpu.training import Trainer, TrainerConfig
    cfg, graphs, model, params = setup(n_graphs=21)
    tcfg = TrainerConfig(batch_size=2, node_bucket=8, num_comp_slots=8,
                         max_nbr=4, edge_shards=2)
    trainer = Trainer(tcfg, CGATConfig(**TINY), graphs,
                      mean=0.1, std=1.3)
    single = trainer.evaluate_split(params, graphs)
    mesh = make_mesh(dp=4, edge=2)
    peval = make_parallel_eval_step(model, trainer.criterion, trainer.mean,
                                    trainer.std, mesh, edge_sharded=True)
    multi = trainer.evaluate_split_parallel(params, graphs, peval, 4)
    for k in ("loss", "mae"):
        np.testing.assert_allclose(multi[k], single[k], rtol=1e-4), k


def test_trainer_fit_multi_device(tmp_path):
    """Trainer.fit with n_devices>1 runs the parallel path end to end."""
    from cgat_tpu.models import CGATConfig
    from cgat_tpu.training import Trainer, TrainerConfig
    graphs = random_graphs(1, 32, n_atoms_range=(3, 6), max_nbr=4,
                           orig_fea=12)
    cfg = TrainerConfig(batch_size=2, epochs=2, node_bucket=8,
                        check_val_every_n_epoch=2, num_comp_slots=8,
                        max_nbr=4, learning_rate=1e-3, n_devices=4,
                        edge_shards=2, ckpt_dir=str(tmp_path))
    trainer = Trainer(cfg, CGATConfig(**TINY), graphs)
    state = trainer.fit()
    import os
    assert os.path.exists(os.path.join(trainer.last_log_dir, "checkpoints",
                                       "best.json"))


def test_halo_collate_layout():
    """Halo structure invariants: every real halo edge's extended source
    index reconstructs its global source through the owner's send-table row
    for this shard; local-block sources never leave their slice."""
    graphs = random_graphs(7, 6, n_atoms_range=(3, 6), max_nbr=4,
                           orig_fea=12)
    S = 4
    b = collate(graphs, max_nbr=4, node_bucket=8, edge_shards=S)
    N, Eh = b.nodes.shape[0], b.halo_src.shape[0]
    n_loc, cap_h = N // S, Eh // S
    send = np.asarray(b.halo_send_idx)     # (S*S, H)
    H = send.shape[1]
    src = np.asarray(b.halo_src)
    ext = np.asarray(b.halo_src_ext)
    mask = np.asarray(b.halo_mask)
    assert send.shape == (S * S, H)
    assert ((send >= 0) & (send < n_loc)).all()
    for s in range(S):
        blk = slice(s * cap_h, (s + 1) * cap_h)
        for g, x, m in zip(src[blk], ext[blk], mask[blk]):
            if not m:
                assert 0 <= x < n_loc   # padding points at a safe local row
                continue
            assert x >= n_loc           # real halo edges are always remote
            j, pos = divmod(x - n_loc, H)
            assert j != s
            assert g == j * n_loc + send[j * S + s, pos]
    # local block: both endpoints in the shard's slice
    E = b.edge_src.shape[0]
    cap = E // S
    lsrc, lmask = np.asarray(b.edge_src), np.asarray(b.edge_mask)
    for s in range(S):
        blk = slice(s * cap, (s + 1) * cap)
        sr = lsrc[blk][lmask[blk]]
        assert np.all((sr >= s * n_loc) & (sr < (s + 1) * n_loc))


def test_halo_overlap_independence():
    """THE overlap property, asserted structurally: in the sharded train
    step there must EXIST local edge-block MH-net matmuls with no
    (transitive) data dependence on any halo ``all_to_all`` — only then can
    XLA schedule the collective concurrently with the layer's dominant
    compute. (Layer 0's four forward MH dots are the witnesses; later
    layers' inputs legitimately depend on earlier exchanges, and backward
    local dots on the merged-softmax cotangent.) Conversely some halo-block
    matmuls MUST depend on it (sanity that the exchange is consumed)."""
    cfg, graphs, model, params = setup()
    mesh = make_mesh(dp=4, edge=2)
    tcfg = TrainerConfig(optim="AdamW", learning_rate=1e-3)
    tx = make_optimizer(tcfg)
    criterion = losses.make_loss("L1", False)
    state = replicate(TrainState(step=jnp.zeros((), jnp.int32), params=params,
                                 opt_state=tx.init(params)), mesh)
    pstep, shard = make_parallel_train_step(model, tx, criterion, 0.1, 1.3,
                                            mesh, donate=False)
    loader = ParallelLoader(graphs, 4, 4, max_nbr=4, node_bucket=8,
                            num_comp_slots=8, edge_shards=2)
    stacked = next(iter(loader))
    jaxpr = jax.make_jaxpr(pstep)(state, shard(stacked))
    cap_l = stacked.edge_src.shape[1] // 2    # per-shard local block size
    cap_h = stacked.halo_src.shape[1] // 2    # per-shard halo block size
    assert cap_l != cap_h, "ambiguous test shapes; adjust graph sizes"

    # taint-propagate from every all_to_all output through the (possibly
    # nested) jaxpr; record for each dot_general the leading dims of its
    # operands and whether it is tainted
    dots = []   # (frozenset of operand leading dims, tainted)

    def is_tainted(v, tainted):
        return getattr(v, "count", None) is not None and v in tainted

    def walk(jxp, tainted):
        for eqn in jxp.eqns:
            t_in = any(is_tainted(v, tainted) for v in eqn.invars)
            t_out = t_in
            if eqn.primitive.name == "dot_general":
                dims = frozenset(v.aval.shape[0] for v in eqn.invars
                                 if v.aval.shape)
                dots.append((dims, t_in))
            for v in eqn.params.values():
                if not (hasattr(v, "jaxpr") or hasattr(v, "eqns")):
                    continue
                inner = v.jaxpr if hasattr(v, "jaxpr") else v
                # seed the inner jaxpr's invars with the outer taint of the
                # corresponding call operands (1:1 for call-like primitives)
                inner_tainted = set()
                for iv, ov in zip(inner.invars, eqn.invars):
                    if is_tainted(ov, tainted):
                        inner_tainted.add(iv)
                if walk(inner, inner_tainted):
                    t_out = True
            if eqn.primitive.name == "all_to_all":
                t_out = True
            if t_out:
                tainted.update(
                    v for v in eqn.outvars if getattr(v, "count", None)
                    is not None)
        return any(is_tainted(v, tainted) for v in jxp.outvars)

    walk(jaxpr.jaxpr, set())
    local_clean = sum(1 for dims, t in dots if cap_l in dims and not t)
    halo_tainted = sum(1 for dims, t in dots if cap_h in dims and t)
    all_dims = sorted(set(d for dims, _ in dots for d in dims))
    # layer 0 alone contributes 4 collective-independent local MH dots
    # (fc_in/fc_out of MH_A and MH_M)
    assert local_clean >= 4, (
        f"only {local_clean} local-block dots are independent of the "
        f"all_to_all — overlap impossible (dot leading dims: {all_dims})")
    assert halo_tainted >= 1, "halo block never consumes the exchange"


def test_halo_comm_is_boundary_proportional():
    """The sharded step must move only boundary-sized payloads per layer:
    one all_to_all of (S, halo, F) per layer, and NO all_gather of the
    (N, F) node features anywhere (the pooling tail's collectives are
    (C, H, F)-sized)."""
    cfg, graphs, model, params = setup()
    mesh = make_mesh(dp=4, edge=2)
    tcfg = TrainerConfig(optim="AdamW", learning_rate=1e-3)
    tx = make_optimizer(tcfg)
    criterion = losses.make_loss("L1", False)
    state = replicate(TrainState(step=jnp.zeros((), jnp.int32), params=params,
                                 opt_state=tx.init(params)), mesh)
    pstep, shard = make_parallel_train_step(model, tx, criterion, 0.1, 1.3,
                                            mesh, donate=False)
    loader = ParallelLoader(graphs, 4, 4, max_nbr=4, node_bucket=8,
                            num_comp_slots=8, edge_shards=2)
    stacked = next(iter(loader))
    jaxpr = jax.make_jaxpr(pstep)(state, shard(stacked))

    def walk(jxp, out):
        for eqn in jxp.eqns:
            if eqn.primitive.name in ("all_gather", "all_to_all",
                                      "all_gather_invariant"):
                out.append((eqn.primitive.name,
                            tuple(v.aval.shape for v in eqn.outvars)))
            for v in eqn.params.values():
                if hasattr(v, "jaxpr"):
                    walk(v.jaxpr, out)
                elif hasattr(v, "eqns"):
                    walk(v, out)
        return out

    colls = walk(jaxpr.jaxpr, [])
    n_loc = stacked.nodes.shape[1] // 2
    node_fea_size = n_loc * 2 * TINY["elem_fea_len"]  # full (N, F) gather
    gathers = [shapes for name, shapes in colls if "all_gather" in name]
    a2a = [shapes for name, shapes in colls if name == "all_to_all"]
    # fwd + transpose in backward per layer; none all_gathers node features
    assert len(a2a) >= TINY["n_graph"], colls
    for shapes in gathers:
        for shp in shapes:
            assert np.prod(shp) < node_fea_size, (
                f"node-feature-sized all_gather {shp} found: {colls}")


def test_embeddings_parallel_matches_single_device():
    """Mesh-sharded embedding pass (GP / AL ranking) == single-device
    embeddings, every graph exactly once, in dataset order."""
    from cgat_tpu.models import CGATConfig
    from cgat_tpu.training import Trainer, TrainerConfig
    cfg, graphs, model, params = setup(n_graphs=21)
    tcfg = TrainerConfig(batch_size=2, node_bucket=8, num_comp_slots=8,
                         max_nbr=4, edge_shards=2)
    trainer = Trainer(tcfg, CGATConfig(**TINY), graphs, mean=0.1, std=1.3)
    single = trainer.embeddings(params, graphs)
    multi = trainer.embeddings_parallel(params, graphs, 4)
    assert multi.shape == single.shape == (21, CGATConfig(**TINY).embedding_dim)
    np.testing.assert_allclose(multi, single, rtol=2e-4, atol=1e-5)


def _fused_mesh_setup():
    """Flagship-like MH dims (bf16, MH-kernel-eligible) on a dp=2 x edge=2
    mesh with forced per-shard edge capacities that satisfy the fused
    kernels' block policy (192 = 16-multiple in [128, 768])."""
    from cgat_tpu.models.host_init import init_params_host
    cfg = CGATConfig(orig_elem_fea_len=16, elem_fea_len=128, n_graph=2,
                     nbr_embedding_size=128, neighbor_number=16, msg_heads=5,
                     n_graph_roost=1, out_hidden=(16,),
                     compute_dtype="bfloat16")
    graphs = random_graphs(0, 4, n_atoms_range=(4, 6), max_nbr=16,
                           orig_fea=16)
    model = CGAtNet(cfg)
    chunks = [graphs[:2], graphs[2:]]
    batches = [collate(c, max_nbr=16, node_bucket=8, num_node_slots=16,
                       num_comp_slots=8, edge_shards=2,
                       edge_slots_per_shard=192, halo_edge_slots=192,
                       halo_slots=8) for c in chunks]
    stacked = stack_batches(batches)
    b0 = collate(graphs[:2], max_nbr=16, node_bucket=8, num_comp_slots=8)
    params = init_params_host(model, b0, seed=0)
    return cfg, model, params, stacked


def _collect_pallas_calls(jxp, out, tainted=None):
    """(kernel_name, leading input dims, tainted-by-all_to_all) triples from
    a (nested) jaxpr — the fused-path analogue of the dot_general taint walk
    in test_halo_overlap_independence."""
    tainted = set() if tainted is None else tainted

    def is_tainted(v, t):
        return getattr(v, "count", None) is not None and v in t

    def walk(jxp, t):
        for eqn in jxp.eqns:
            t_in = any(is_tainted(v, t) for v in eqn.invars)
            t_out = t_in
            if eqn.primitive.name == "pallas_call":
                dims = frozenset(v.aval.shape[0] for v in eqn.invars
                                 if v.aval.shape)
                out.append((eqn.params.get("name"), dims, t_in))
            for v in eqn.params.values():
                if not (hasattr(v, "jaxpr") or hasattr(v, "eqns")):
                    continue
                inner = v.jaxpr if hasattr(v, "jaxpr") else v
                inner_t = set()
                for iv, ov in zip(inner.invars, eqn.invars):
                    if is_tainted(ov, t):
                        inner_t.add(iv)
                if walk(inner, inner_t):
                    t_out = True
            if eqn.primitive.name == "all_to_all":
                t_out = True
            if t_out:
                t.update(v for v in eqn.outvars
                         if getattr(v, "count", None) is not None)
        return any(is_tainted(v, t) for v in jxp.outvars)

    walk(jxp, tainted)
    return out


def test_fused_kernels_engage_under_edge_sharding():
    """VERDICT r4 ask 1: the edge-sharded shard_map train step must run the
    round-4 production kernels per cell — fused MH network (fwd AND custom
    bwd), flat segment-attention PAIR (union softmax), CSR gather backward —
    asserted on the step jaxpr, with the layer-0 local MH kernels
    structurally independent of the boundary all_to_all (overlap), and the
    step numerically matching the XLA-backend step."""
    import optax
    from cgat_tpu.ops import attention as att
    cfg, model, params, stacked = _fused_mesh_setup()
    tcfg = TrainerConfig(optim="AdamW", learning_rate=1e-3)
    criterion = losses.make_loss("L1", False)
    mesh = make_mesh(dp=2, edge=2)

    results = {}
    jaxpr = None
    for backend in ("pallas", "xla"):
        att.set_backend(backend)
        try:
            tx = make_optimizer(tcfg)
            state = replicate(TrainState(step=jnp.zeros((), jnp.int32),
                                         params=params,
                                         opt_state=tx.init(params)), mesh)
            pstep, shard = make_parallel_train_step(
                model, tx, criterion, 0.0, 1.0, mesh, edge_sharded=True,
                donate=False)
            if backend == "pallas":
                jaxpr = jax.make_jaxpr(pstep)(state, shard(stacked))
            new_state, m = pstep(state, shard(stacked))
            results[backend] = (jax.tree.map(
                lambda x: np.asarray(x, np.float32), new_state.params),
                float(m["loss"]))
        finally:
            att.set_backend("xla")

    calls = _collect_pallas_calls(jaxpr.jaxpr, [])
    names = {n for n, _d, _t in calls}
    # every production kernel family engages inside the sharded step
    for want in ("mh_net_fwd", "mh_net_bwd", "seg_attn_fwd", "seg_attn_bwd",
                 "csr_segment_sum"):
        assert want in names, (want, sorted(names))
    # overlap: some local-block (cap=192 rows) MH forward kernels carry NO
    # data dependence on the all_to_all (layer 0's gate+message nets)
    clean_mh = [c for c in calls
                if c[0] == "mh_net_fwd" and 192 in c[1] and not c[2]]
    assert len(clean_mh) >= 2, calls
    # sanity: something does consume the exchange
    assert any(t for _n, _d, t in calls), "no kernel consumes the halo"

    # numerics: fused vs XLA backend on the same sharded step (bf16 noise)
    np.testing.assert_allclose(results["pallas"][1], results["xla"][1],
                               rtol=2e-2)
    for a, b in zip(jax.tree.leaves(results["pallas"][0]),
                    jax.tree.leaves(results["xla"][0])):
        np.testing.assert_allclose(a, b, rtol=5e-2, atol=5e-3)


def test_fused_edge_sharded_matches_single_device():
    """Same graphs, same params: the fused edge-sharded step's loss equals
    the single-device (fused, unsharded) step's loss to bf16 tolerance."""
    from cgat_tpu.ops import attention as att
    cfg, model, params, stacked = _fused_mesh_setup()
    tcfg = TrainerConfig(optim="AdamW", learning_rate=1e-3)
    criterion = losses.make_loss("L1", False)
    mesh = make_mesh(dp=2, edge=2)
    att.set_backend("pallas")
    try:
        tx = make_optimizer(tcfg)
        state = replicate(TrainState(step=jnp.zeros((), jnp.int32),
                                     params=params,
                                     opt_state=tx.init(params)), mesh)
        pstep, shard = make_parallel_train_step(
            model, tx, criterion, 0.0, 1.0, mesh, edge_sharded=True,
            donate=False)
        _, m = pstep(state, shard(stacked))

        def loss_fn(p):
            outs = [model.apply({"params": p},
                                jax.tree.map(lambda x: x[d], stacked))
                    for d in range(2)]
            out = jnp.stack(outs)
            return criterion(out[..., 0], out[..., 1], stacked.target,
                             stacked.graph_mask)

        want = float(loss_fn(params))
    finally:
        att.set_backend("xla")
    np.testing.assert_allclose(float(m["loss"]), want, rtol=2e-2)
