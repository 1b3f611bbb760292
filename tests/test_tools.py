"""Active-learning toolkit tests: sampling, error ranking, shard bookkeeping."""
import os

import numpy as np
import pytest

from cgat_tpu.tools import MarkovChain, sample, shards, symbol_to_z
from cgat_tpu.tools.annotate import annotate_volume_and_ids
from cgat_tpu.tools.embeddings import remove_batch_ids


def make_prepared(n, id_offset=0, seed=0):
    rng = np.random.default_rng(seed)
    inputs = np.empty((3, n), dtype=object)
    elements = ["Na", "Cl", "K", "O", "Fe"]
    comps, batch_comp = [], []
    for i in range(n):
        na = int(rng.integers(2, 5))
        inputs[0, i] = rng.integers(1, 5, (na, 4))
        inputs[1, i] = np.repeat(np.arange(na)[:, None], 4, 1)
        inputs[2, i] = rng.integers(0, na, (na, 4))
        els = [elements[int(x)] for x in rng.integers(0, 5, na)]
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


def test_markov_chain_matches_distribution():
    chain = MarkovChain(lambda x: 1.0 if x > 0.5 else 0.25,
                        lambda rng: rng.random(), seed=0)
    chain.step(5000)
    arr = np.asarray(chain.chain)
    frac_high = np.mean(arr > 0.5)
    # equal-width regions with 1:0.25 density -> stationary high mass = 0.8
    assert 0.75 < frac_high < 0.85
    # proposals from U(0,1) into a bimodal 1:0.25 target accept often
    assert chain.acceptance_rate > 0.5


def test_markov_chain_discrete_stationary():
    w = np.array([0.0, 1.0, 3.0, 6.0])
    chain = MarkovChain.discrete(w, seed=3).step(20000)
    arr = chain.chain
    assert not np.any(arr == 0)          # zero-mass state never visited
    freq = np.bincount(arr, minlength=4) / arr.size
    np.testing.assert_allclose(freq, w / w.sum(), atol=0.02)


def test_markov_chain_seed_reproducible():
    a = MarkovChain.discrete([1.0, 2.0, 3.0], seed=7).step(100).chain
    b = MarkovChain.discrete([1.0, 2.0, 3.0], seed=7).step(100).chain
    np.testing.assert_array_equal(a, b)
    assert len(a) == 101


def test_markov_chain_rejects_empty_target():
    with pytest.raises(ValueError):
        MarkovChain.discrete([0.0, 0.0])
    with pytest.raises(ValueError):
        MarkovChain(lambda x: 0.0, lambda rng: rng.random(),
                    max_init_tries=10)


def test_symbol_to_z():
    assert symbol_to_z("H") == 1
    assert symbol_to_z("Fe2") == 26
    assert symbol_to_z("Og") == 118


def test_element_correlation_and_distribution():
    sets = [{1, 8}, {1, 8}, {1, 17}, {26, 8}]
    corr = sample.element_correlation(sets, max_z=30)
    assert corr[0, 7] == pytest.approx(2 / 3)   # H with O in 2 of 3 H-compounds
    assert np.all(np.diag(corr) == 0)
    dist = sample.element_distribution(corr)
    assert dist(0) > 0


def test_shard_roundtrip_and_sampling(tmp_path):
    pool = str(tmp_path / "pool")
    os.makedirs(pool)
    for i in range(3):
        shards.save_pickle(make_prepared(20, id_offset=i * 20, seed=i),
                           shards.shard_path(i, pool))

    ids, element_sets, stoich = sample.scan_pool(pool, exclude_ids={"0,225"})
    assert len(ids) == 59  # one excluded
    chosen = sample.random_sample(ids, 10, seed=1)
    assert len(chosen) == 10

    out = str(tmp_path / "al")
    merged = sample.extract_sample(pool, out, chosen)
    assert len(merged["batch_ids"]) == 10
    # pool shards rewritten without the chosen entries
    total = sum(len(shards.load_pickle(p)["batch_ids"])
                for _, p in shards.iter_shards(out))
    assert total == 50
    # no chosen id left in the pool
    remaining = set()
    for _, p in shards.iter_shards(out):
        remaining |= set(shards.entry_ids(shards.load_pickle(p)))
    assert not (remaining & chosen)


def test_metropolis_sample_balanced(tmp_path):
    pool = str(tmp_path / "pool")
    os.makedirs(pool)
    shards.save_pickle(make_prepared(60, seed=3), shards.shard_path(0, pool))
    ids, element_sets, stoich = sample.scan_pool(pool)
    chosen = sample.metropolis_sample(ids, element_sets, stoich, 10, seed=2)
    assert 0 < len(chosen) <= 10


def test_error_ranking(tmp_path):
    import csv
    pool = str(tmp_path / "pool")
    os.makedirs(os.path.join(pool, "temp"))
    for i in range(2):
        d = make_prepared(10, id_offset=i * 10, seed=i)
        shards.save_pickle(d, shards.shard_path(i, pool))
        from cgat_tpu.tools.errors import error_csv_path
        with open(error_csv_path(i, pool), "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["batch_ids", "errors"])
            for j, b in enumerate(shards.entry_ids(d)):
                w.writerow([b, float(i * 10 + j)])
    from cgat_tpu.tools.errors import get_highest_errors
    picked = get_highest_errors(pool, n=5)
    assert len(picked["batch_ids"]) == 5
    # highest errors = last ids of second shard
    got = {shards.batch_id_str(b) for b in picked["batch_ids"]}
    assert got == {f"{k},225" for k in (15, 16, 17, 18, 19)}
    total = sum(len(shards.load_pickle(p)["batch_ids"])
                for _, p in shards.iter_shards(pool))
    assert total == 15


def test_annotate_volume_and_ids():
    entries = [
        {"lattice": np.eye(3) * 4.0,
         "frac_coords": np.zeros((2, 3)),
         "species": ["Na", "Cl"], "data": {"id": "abc-spg225-x"}},
        {"lattice": np.eye(3) * 4.0,
         "frac_coords": np.zeros((1, 3)),
         "species": ["Na"], "data": {}},   # unary -> dropped
    ]
    kept, next_id = annotate_volume_and_ids(entries)
    assert len(kept) == 1 and next_id == 1
    assert kept[0]["data"]["id"] == "0,225"
    assert kept[0]["data"]["volume"] == pytest.approx(32.0)


def test_remove_batch_ids_embedding_layout():
    d = {
        "input": np.arange(12).reshape(4, 3).astype(np.float32),
        "batch_ids": [["0,1"], ["1,1"], ["2,1"], ["3,1"]],
        "batch_comp": np.asarray(["a", "b", "c", "d"], dtype=object),
        "target": {"e": np.arange(4.0)},
        "comps": np.asarray(["a", "b", "c", "d"], dtype=object),
    }
    out = remove_batch_ids(d, {"1,1", "3,1"})
    assert [b[0] for b in out["batch_ids"]] == ["0,1", "2,1"]
    assert out["input"].shape == (2, 3)
    np.testing.assert_array_equal(out["target"]["e"], [0.0, 2.0])


def test_get_composition_patterns():
    """Mirrors the reference's only assert-based test
    (Utilities/get_additional_data.py:42-67)."""
    from cgat_tpu.tools.additional_data import get_composition
    cases = {
        "/x/binaries/A2B13/annotated/batch-000.json.bz2": "A2B13",
        "/x/binaries/AB2/annotated/batch-000.json.bz2": "AB2",
        "/x/binaries/AB/annotated/batch-000.json.bz2": "AB",
        "/x/ternaries/A2B2C5/annotated/batch-000.json.bz2": "A2B2C5",
        "/x/ternaries/A3B4C12/annotated/batch-000.json.bz2": "A3B4C12",
    }
    for path, want in cases.items():
        assert get_composition(path) == want


@pytest.mark.slow
def test_active_learning_error_loop_end_to_end(tmp_path):
    """calculate_errors + get_highest_errors against a real trained tiny
    checkpoint over a sharded pool (Utilities/calculate_errors.py flow)."""
    import jax
    from cgat_tpu.data.featurizer import build_dataset_prepare
    from cgat_tpu.models import CGATConfig
    from cgat_tpu.training import Trainer, TrainerConfig
    from cgat_tpu.tools.errors import calculate_errors, get_highest_errors

    rng = np.random.default_rng(7)
    def cubic(i):
        return {
            "lattice": np.eye(3) * rng.uniform(3.0, 4.0) * 2,
            "frac_coords": np.stack(np.meshgrid(*[[0, .5]]*3,
                                                indexing="ij"), -1
                                    ).reshape(-1, 3),
            "species": [["Na", "Cl", "K", "O"][int(x)]
                        for x in rng.integers(0, 4, 8)],
            "data": {"id": f"{i},1",
                     "e_above_hull": float(rng.random()),
                     "e_form": 0.0},
        }
    pool = str(tmp_path / "pool")
    from cgat_tpu.tools import shards
    for s in range(2):
        d = build_dataset_prepare([cubic(s * 8 + j) for j in range(8)],
                                  max_neighbor_number=6, progress=False)
        shards.save_pickle(d, shards.shard_path(s, pool))

    # train a tiny ckpt on the same kind of data
    from cgat_tpu.data.dataset import load_prepared
    from cgat_tpu.data.embedding import Featuriser
    graphs = load_prepared(shards.shard_path(0, pool),
                           max_neighbor_number=6, target="e_above_hull")
    cfg = TrainerConfig(batch_size=4, epochs=2, node_bucket=16, max_nbr=6,
                        target="e_above_hull", ckpt_dir=str(tmp_path),
                        run_name="al", val_size=0.25, test_size=0.25)
    mcfg = CGATConfig(orig_elem_fea_len=200, elem_fea_len=8, n_graph=1,
                      nbr_embedding_size=8, neighbor_number=6, msg_heads=2,
                      n_graph_roost=1, out_hidden=(8,))
    trainer = Trainer(cfg, mcfg, graphs)
    trainer.fit()
    run_dir = trainer.last_log_dir

    calculate_errors(run_dir, pool, target="e_above_hull")
    picked = get_highest_errors(pool, n=4)
    assert len(picked["batch_ids"]) == 4
    remaining = sum(len(shards.load_pickle(p)["batch_ids"])
                    for _, p in shards.iter_shards(pool))
    assert remaining == 12


@pytest.mark.slow
def test_active_learning_round_orchestrator(tmp_path):
    """Full round: initial sample -> train -> error ranking -> absorb top-N
    (SURVEY.md section 3.5 workflow as one call)."""
    import jax
    from cgat_tpu.data.featurizer import build_dataset_prepare
    from cgat_tpu.models import CGATConfig
    from cgat_tpu.tools.loop import active_learning_round, initial_sample
    from cgat_tpu.training import TrainerConfig

    rng = np.random.default_rng(9)
    def cubic(i):
        return {
            "lattice": np.eye(3) * rng.uniform(3.0, 4.0) * 2,
            "frac_coords": np.stack(np.meshgrid(*[[0, .5]]*3,
                                                indexing="ij"), -1
                                    ).reshape(-1, 3),
            "species": [["Na", "Cl", "K", "O"][int(x)]
                        for x in rng.integers(0, 4, 8)],
            "data": {"id": f"{i},1",
                     "e_above_hull": float(rng.random()), "e_form": 0.0},
        }
    pool = str(tmp_path / "pool")
    for s in range(2):
        d = build_dataset_prepare([cubic(s * 10 + j) for j in range(10)],
                                  max_neighbor_number=6, progress=False)
        shards.save_pickle(d, shards.shard_path(s, pool))

    al_pool = str(tmp_path / "al")
    sample_dict = initial_sample(pool, al_pool, 8, seed=1)
    assert len(sample_dict["batch_ids"]) == 8
    sample_path = str(tmp_path / "sample.pickle.gz")
    shards.save_pickle(sample_dict, sample_path)

    tcfg = TrainerConfig(batch_size=4, epochs=2, node_bucket=16, max_nbr=6,
                         target="e_above_hull", ckpt_dir=str(tmp_path),
                         run_name="alr", val_size=0.25, test_size=0.25)
    mcfg = CGATConfig(orig_elem_fea_len=200, elem_fea_len=8, n_graph=1,
                      nbr_embedding_size=8, neighbor_number=6, msg_heads=2,
                      n_graph_roost=1, out_hidden=(8,))
    run_dir, new_sample = active_learning_round(
        al_pool, sample_path, trainer_cfg=tcfg, model_cfg=mcfg, n_new=4)
    assert new_sample is not None and len(new_sample["batch_ids"]) == 4
    merged = shards.load_pickle(sample_path)
    assert len(merged["batch_ids"]) == 12
    remaining = sum(len(shards.load_pickle(p)["batch_ids"])
                    for _, p in shards.iter_shards(al_pool))
    assert remaining == 8  # 20 - 8 initial - 4 absorbed


def test_element_correlation_cli(tmp_path):
    from cgat_tpu.tools import element_correlation as ec_cli
    pool = str(tmp_path / "pool")
    os.makedirs(pool)
    for i in range(2):
        shards.save_pickle(make_prepared(15, id_offset=i * 15, seed=i),
                           shards.shard_path(i, pool))
    out = tmp_path / "corr.npz"
    rc = ec_cli.main(["--pool-dir", pool, "--out", str(out), "--top", "3"])
    assert rc == 0
    corr = np.load(out)["correlation"]
    assert corr.ndim == 2 and corr.shape[0] == corr.shape[1]
    assert np.all(np.diag(corr) == 0)


def test_tsne_cli(tmp_path):
    import gzip
    import pickle
    from cgat_tpu.tools import tsne as tsne_cli
    rng = np.random.default_rng(0)
    data = {"input": rng.standard_normal((30, 8)).astype(np.float32),
            "batch_ids": [[f"{i},1"] for i in range(30)],
            "batch_comp": np.asarray(["x"] * 30, dtype=object),
            "target": {"e_above_hull": rng.standard_normal(30)},
            "comps": np.asarray(["x"] * 30, dtype=object)}
    path = tmp_path / "emb.pickle.gz"
    with gzip.open(path, "wb") as f:
        pickle.dump(data, f)
    out = tmp_path / "tsne.csv"
    rc = tsne_cli.main([str(path), "--target", "e_above_hull",
                        "--perplexity", "5", "--out", str(out)])
    assert rc == 0
    rows = open(out).read().strip().splitlines()
    assert len(rows) == 31  # header + 30 points
    assert rows[0].startswith("x,y,target")


@pytest.mark.slow
def test_active_learning_gp_uncertainty_acquisition(tmp_path):
    """GP-std acquisition: rank the pool by SVGP predictive uncertainty on
    frozen embeddings (label-free) instead of |error|; the round absorbs
    top-N exactly like the error path."""
    import csv

    from cgat_tpu.data.featurizer import build_dataset_prepare
    from cgat_tpu.models import CGATConfig
    from cgat_tpu.tools.errors import error_csv_path
    from cgat_tpu.tools.loop import active_learning_round, initial_sample
    from cgat_tpu.training import TrainerConfig

    rng = np.random.default_rng(17)

    def cubic(i):
        return {
            "lattice": np.eye(3) * rng.uniform(3.0, 4.0) * 2,
            "frac_coords": np.stack(np.meshgrid(*[[0, .5]] * 3,
                                                indexing="ij"), -1
                                    ).reshape(-1, 3),
            "species": [["Na", "Cl", "K", "O"][int(x)]
                        for x in rng.integers(0, 4, 8)],
            "data": {"id": f"{i},1",
                     "e_above_hull": float(rng.random()), "e_form": 0.0},
        }

    pool = str(tmp_path / "pool")
    for s in range(2):
        d = build_dataset_prepare([cubic(s * 10 + j) for j in range(10)],
                                  max_neighbor_number=6, progress=False)
        shards.save_pickle(d, shards.shard_path(s, pool))

    al_pool = str(tmp_path / "al")
    sample_path = str(tmp_path / "sample.pickle.gz")
    shards.save_pickle(initial_sample(pool, al_pool, 8, seed=1), sample_path)

    tcfg = TrainerConfig(batch_size=4, epochs=2, node_bucket=16, max_nbr=6,
                         target="e_above_hull", ckpt_dir=str(tmp_path),
                         run_name="algp", val_size=0.25, test_size=0.25)
    mcfg = CGATConfig(orig_elem_fea_len=200, elem_fea_len=8, n_graph=1,
                      nbr_embedding_size=8, neighbor_number=6, msg_heads=2,
                      n_graph_roost=1, out_hidden=(8,))
    run_dir, new_sample = active_learning_round(
        al_pool, sample_path, trainer_cfg=tcfg, model_cfg=mcfg, n_new=4,
        acquisition="gp_std",
        gp_kwargs=dict(num_inducing=8, epochs=10, batch_size=8))
    assert new_sample is not None and len(new_sample["batch_ids"]) == 4
    assert len(shards.load_pickle(sample_path)["batch_ids"]) == 12

    # the score CSVs hold finite positive predictive stds
    with open(error_csv_path(0, al_pool), newline="") as f:
        scores = [float(r["errors"]) for r in csv.DictReader(f)]
    assert scores and all(np.isfinite(scores)) and all(s > 0 for s in scores)
