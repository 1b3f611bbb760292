"""Out-of-core streaming: metadata scan/cache, shard loader, streaming fit.

The reference's pool is 283 shards of 10k entries
(Utilities/calculate_errors.py:71); streaming training keeps one shard in
host memory at a time (cgat_tpu/data/streaming.py).
"""
import json
import os

import numpy as np
import pytest

from cgat_tpu.data.dataset import load_prepared
from cgat_tpu.data.streaming import (StreamingGraphLoader, list_shards,
                                     scan_shard_metadata)
from cgat_tpu.tools import shards

ELEMENTS = ["Na", "Cl", "K", "O"]


def make_prepared(n, id_offset=0, seed=0):
    rng = np.random.default_rng(seed)
    inputs = np.empty((3, n), dtype=object)
    comps, batch_comp = [], []
    for i in range(n):
        na = int(rng.integers(2, 6))
        inputs[0, i] = rng.integers(1, 5, (na, 4))
        inputs[1, i] = np.repeat(np.arange(na)[:, None], 4, 1)
        inputs[2, i] = rng.integers(0, na, (na, 4))
        els = [ELEMENTS[int(x)] for x in rng.integers(0, len(ELEMENTS), na)]
        comps.append(np.asarray(els, dtype=object))
        cnt = {}
        for e in els:
            cnt[e] = cnt.get(e, 0) + 1
        batch_comp.append(" ".join(f"{k}{v}" for k, v in cnt.items()))
    return {
        "input": inputs,
        "batch_ids": [[f"{id_offset + i},225"] for i in range(n)],
        "batch_comp": np.asarray(batch_comp, dtype=object),
        "target": {"e_above_hull": rng.standard_normal(n)},
        "comps": np.asarray(comps, dtype=object),
    }


@pytest.fixture
def fea16(tmp_path):
    rng = np.random.default_rng(42)
    table = {el: rng.standard_normal(16).tolist() for el in ELEMENTS}
    p = str(tmp_path / "fea16.json")
    with open(p, "w") as f:
        json.dump(table, f)
    return p


@pytest.fixture
def pool(tmp_path):
    d = str(tmp_path / "pool")
    os.makedirs(d)
    for i in range(3):
        shards.save_pickle(make_prepared(16, id_offset=i * 16, seed=i),
                           shards.shard_path(i, d))
    return d


def test_metadata_matches_direct_computation(pool, fea16):
    meta = scan_shard_metadata(pool, target="e_above_hull", fea_path=fea16,
                               max_nbr=4)
    graphs = []
    for p in list_shards(pool):
        graphs.extend(load_prepared(p, fea_path=fea16,
                                    max_neighbor_number=4,
                                    target="e_above_hull"))
    ys = np.asarray([g.target for g in graphs], np.float64)
    assert meta["n_graphs"] == len(graphs) == 48
    assert meta["mean"] == pytest.approx(float(ys.mean()), rel=1e-9)
    # torch-style unbiased std, same as Trainer._setup_data
    assert meta["std"] == pytest.approx(float(ys.std(ddof=1)), rel=1e-9)
    assert meta["num_comp_slots"] == max(g.comp_fea.shape[0] for g in graphs)
    assert meta["per_shard_counts"] == [16, 16, 16]

    # cached sidecar is reused while the shards are unchanged...
    cache = os.path.join(pool, ".cgat_meta.json")
    assert os.path.exists(cache)
    with open(cache) as f:
        on_disk = json.load(f)
    meta2 = scan_shard_metadata(pool, target="e_above_hull", fea_path=fea16,
                                max_nbr=4)
    assert meta2 == on_disk
    # ...and invalidated when a shard changes
    shards.save_pickle(make_prepared(20, id_offset=99, seed=7),
                       shards.shard_path(0, pool))
    meta3 = scan_shard_metadata(pool, target="e_above_hull", fea_path=fea16,
                                max_nbr=4)
    assert meta3["n_graphs"] == 52


def test_streaming_loader_covers_dataset(pool, fea16):
    loader = StreamingGraphLoader(pool, 5, target="e_above_hull",
                                  fea_path=fea16, max_nbr=4, node_bucket=8,
                                  shuffle=False, drop_last=False)
    batches = list(loader)
    n = sum(int(np.asarray(b.graph_mask).sum()) for b in batches)
    assert n == 48
    assert len(batches) == len(loader) == -(-48 // 5)
    # static-shape family: every batch shares one comp/graph geometry
    assert len({(b.comp_fea.shape, b.target.shape) for b in batches}) == 1


def test_streaming_loader_deterministic_epochs(pool, fea16):
    def targets_of_epoch(epoch, prefetch):
        loader = StreamingGraphLoader(pool, 4, target="e_above_hull",
                                      fea_path=fea16, max_nbr=4,
                                      node_bucket=8, seed=3,
                                      prefetch=prefetch)
        loader.set_epoch(epoch)
        out = []
        for b in loader:
            out.extend(np.asarray(b.target)[np.asarray(b.graph_mask)])
        return out

    e0a, e0b = targets_of_epoch(0, True), targets_of_epoch(0, False)
    assert e0a == e0b  # prefetch thread changes nothing; resume-stable order
    assert e0a != targets_of_epoch(1, True)  # reshuffled across epochs


def test_streaming_parallel_loader_groups(pool, fea16):
    from cgat_tpu.parallel import StreamingParallelLoader

    stream = StreamingGraphLoader(pool, 4, target="e_above_hull",
                                  fea_path=fea16, max_nbr=4, node_bucket=8,
                                  shuffle=True, seed=5, prefetch=False)
    loader = StreamingParallelLoader(stream, 2)
    batches = list(loader)
    # 48 graphs / (bs 4 x 2 replicas) = 6 stacked groups
    assert len(batches) == len(loader) == 6
    for b in batches:
        assert b.target.shape == (2, 4)   # (D, C) stacked
        assert int(np.asarray(b.graph_mask).sum()) == 8
    # process slicing: each process collates its own dp row of each group,
    # with identical group-wide shapes
    l0 = StreamingParallelLoader(
        StreamingGraphLoader(pool, 4, target="e_above_hull", fea_path=fea16,
                             max_nbr=4, node_bucket=8, seed=5,
                             prefetch=False),
        2, process_index=0, process_count=2)
    l1 = StreamingParallelLoader(
        StreamingGraphLoader(pool, 4, target="e_above_hull", fea_path=fea16,
                             max_nbr=4, node_bucket=8, seed=5,
                             prefetch=False),
        2, process_index=1, process_count=2)
    for full, b0, b1 in zip(batches, l0, l1):
        np.testing.assert_array_equal(np.asarray(full.target[0]),
                                      np.asarray(b0.target[0]))
        np.testing.assert_array_equal(np.asarray(full.target[1]),
                                      np.asarray(b1.target[0]))


def test_streaming_fit_parallel(pool, fea16, tmp_path):
    """Streaming + dp mesh: out-of-core groups drive the shard_map step."""
    from cgat_tpu.models import CGATConfig
    from cgat_tpu.training import Trainer, TrainerConfig

    val_dir = str(tmp_path / "val")
    os.makedirs(val_dir)
    shards.save_pickle(make_prepared(8, id_offset=1000, seed=9),
                       shards.shard_path(0, val_dir))
    cfg = TrainerConfig(data_path=pool, val_path=val_dir, streaming=True,
                        target="e_above_hull", fea_path=fea16,
                        batch_size=4, node_bucket=8, max_nbr=4,
                        num_comp_slots=8, check_val_every_n_epoch=1,
                        learning_rate=3e-3, ckpt_dir=str(tmp_path),
                        n_devices=2)
    mcfg = CGATConfig(orig_elem_fea_len=16, elem_fea_len=8, n_graph=2,
                      nbr_embedding_size=8, neighbor_number=4, msg_heads=2,
                      n_graph_roost=1, out_hidden=(16, 8))
    trainer = Trainer(cfg, mcfg)
    trainer.fit(epochs=1)
    log = os.path.join(trainer.last_log_dir, "metrics.jsonl")
    recs = [json.loads(l) for l in open(log)]
    assert any("train_loss" in r and np.isfinite(r["train_loss"])
               for r in recs)
    assert any("val_mae" in r and np.isfinite(r["val_mae"]) for r in recs)


def test_streaming_fit(pool, fea16, tmp_path):
    from cgat_tpu.models import CGATConfig
    from cgat_tpu.training import Trainer, TrainerConfig

    val_dir = str(tmp_path / "val")
    os.makedirs(val_dir)
    shards.save_pickle(make_prepared(8, id_offset=1000, seed=9),
                       shards.shard_path(0, val_dir))

    cfg = TrainerConfig(data_path=pool, val_path=val_dir, streaming=True,
                        target="e_above_hull", fea_path=fea16,
                        batch_size=4, node_bucket=8, max_nbr=4,
                        num_comp_slots=None, check_val_every_n_epoch=1,
                        learning_rate=3e-3, ckpt_dir=str(tmp_path))
    mcfg = CGATConfig(orig_elem_fea_len=16, elem_fea_len=8, n_graph=2,
                      nbr_embedding_size=8, neighbor_number=4, msg_heads=2,
                      n_graph_roost=1, out_hidden=(16, 8))
    trainer = Trainer(cfg, mcfg)
    assert trainer.train_graphs == [] and len(trainer.val_graphs) == 8
    state = trainer.fit(epochs=2)
    assert state is not None
    # metrics logged and finite; a checkpoint exists
    log = os.path.join(trainer.last_log_dir, "metrics.jsonl")
    recs = [json.loads(l) for l in open(log)]
    assert any("val_mae" in r and np.isfinite(r["val_mae"]) for r in recs)
    assert os.path.isdir(os.path.join(trainer.last_log_dir, "checkpoints"))


def test_prefetch_loader_transparent(pool, fea16):
    """PrefetchLoader yields the same batches/counts as the bare loader."""
    from cgat_tpu.data.prefetch import PrefetchLoader

    def run(wrap):
        loader = StreamingGraphLoader(pool, 4, target="e_above_hull",
                                      fea_path=fea16, max_nbr=4,
                                      node_bucket=8, seed=7, prefetch=False)
        if wrap:
            loader = PrefetchLoader(loader)
        loader.set_epoch(0)
        out = []
        for b in loader:
            out.append((tuple(np.asarray(b.target)),
                        loader.last_counts["edges"]))
        return out

    assert run(False) == run(True)


def test_prefetch_loader_propagates_errors(pool, fea16):
    from cgat_tpu.data.prefetch import PrefetchLoader

    class Boom:
        def __iter__(self):
            yield 1
            raise RuntimeError("collate failed")

    loader = PrefetchLoader(Boom())
    it = iter(loader)
    next(it)
    with pytest.raises(RuntimeError, match="collate failed"):
        next(it)
