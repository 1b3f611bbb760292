"""One simulated pod host for tests/test_multihost.py.

Launched twice by the test with ``JAX_COORDINATOR_ADDRESS`` /
``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` set and 4 virtual CPU devices per
process (gloo collectives): the TPU-native analogue of the reference's
multi-node DDP launch (reference CGAT/train.py:100-104). ``run`` is also
imported by the test and executed single-process (8 devices) to produce the
trajectory the 2-process run must reproduce.
"""
import os
import pickle
import sys

# When launched as a subprocess, python puts tests/ (the script dir) on
# sys.path, not the repo root — so cgat_tpu resolves only if the package is
# pip-installed. Make the worker self-sufficient on a bare checkout.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


TINY = dict(orig_elem_fea_len=12, elem_fea_len=8, n_graph=2,
            nbr_embedding_size=8, neighbor_number=4, msg_heads=2,
            n_graph_roost=1, out_hidden=(8,))


def run(out_path: str, edge: int = 1, stream_dir: str = "",
        fea_path: str = ""):
    """Train 3 full steps of the real model over an 8-device ('dp','edge')
    mesh with a process-sliced loader; process 0 dumps the loss trajectory +
    final params. With ``stream_dir`` the batches come out-of-core through
    StreamingParallelLoader (every process streams all shards, collates its
    own dp rows) instead of the in-memory ParallelLoader."""
    import numpy as np
    import jax.numpy as jnp
    from cgat_tpu.data import collate
    from cgat_tpu.data.synthetic import random_graphs
    from cgat_tpu.models import CGATConfig, CGAtNet
    from cgat_tpu.parallel import (ParallelLoader, StreamingParallelLoader,
                                   make_mesh, make_parallel_train_step,
                                   replicate)
    from cgat_tpu.training import TrainerConfig, losses, make_optimizer
    from cgat_tpu.training.trainer import TrainState

    dp = 8 // edge
    mesh = make_mesh(dp=dp, edge=edge)
    cfg = CGATConfig(**(dict(TINY, orig_elem_fea_len=16) if stream_dir
                        else TINY))
    model = CGAtNet(cfg)
    if stream_dir:
        from cgat_tpu.data.streaming import StreamingGraphLoader
        stream = StreamingGraphLoader(
            stream_dir, 2, target="e_above_hull", fea_path=fea_path,
            max_nbr=4, node_bucket=8, shuffle=True, seed=0, prefetch=False)
        loader = StreamingParallelLoader(
            stream, dp, edge_shards=edge,
            process_index=jax.process_index(),
            process_count=jax.process_count())
        from cgat_tpu.data.dataset import load_prepared
        from cgat_tpu.data.streaming import list_shards
        init_graphs = load_prepared(list_shards(stream_dir)[0],
                                    fea_path=fea_path,
                                    max_neighbor_number=4,
                                    target="e_above_hull")[:4]
        b0 = collate(init_graphs, max_nbr=4, node_bucket=8)
    else:
        graphs = random_graphs(0, 3 * 2 * dp, n_atoms_range=(3, 6),
                               max_nbr=4, orig_fea=12)
        b0 = collate(graphs[:4], max_nbr=4, node_bucket=8)
        loader = ParallelLoader(graphs, 2, dp, max_nbr=4, node_bucket=8,
                                num_comp_slots=8, edge_shards=edge,
                                process_index=jax.process_index(),
                                process_count=jax.process_count())
    params = model.init(jax.random.key(0), b0)["params"]
    tcfg = TrainerConfig(optim="AdamW", learning_rate=1e-3)
    tx = make_optimizer(tcfg)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    criterion = losses.make_loss("L1", False)
    pstep, shard = make_parallel_train_step(
        model, tx, criterion, 0.1, 1.3, mesh, edge_sharded=edge > 1,
        donate=False)
    state = replicate(state, mesh)
    loss_traj = []
    for batch in loader:
        state, m = pstep(state, shard(batch))
        loss_traj.append(float(m["loss"]))

    if jax.process_index() == 0:
        def host(x):
            if isinstance(x, jax.Array) and not x.is_fully_addressable:
                return np.asarray(x.addressable_shards[0].data)
            return np.asarray(x)

        with open(out_path, "wb") as f:
            pickle.dump({"losses": loss_traj,
                         "params": jax.tree.map(host, state.params)}, f)


def main():
    out_path, edge = sys.argv[1], int(sys.argv[2])
    stream_dir = sys.argv[3] if len(sys.argv) > 3 else ""
    fea_path = sys.argv[4] if len(sys.argv) > 4 else ""
    jax.config.update("jax_platforms", "cpu")
    from cgat_tpu.parallel import maybe_initialize_distributed
    assert maybe_initialize_distributed(), "coordinator env vars missing"
    assert jax.process_count() == 2
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4
    run(out_path, edge, stream_dir, fea_path)


if __name__ == "__main__":
    main()
