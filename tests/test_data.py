"""Data pipeline tests: featurizer, prepared-dict round trip, loader."""
import gzip
import pickle

import numpy as np
import pytest

from cgat_tpu.data import CrystalGraph, collate
from cgat_tpu.data.dataset import GraphLoader, load_prepared, split_dataset
from cgat_tpu.data.embedding import Featuriser, load_featuriser
from cgat_tpu.data.featurizer import (
    build_dataset_prepare, periodic_neighbors, prepare_graphs,
)


def simple_cubic(a=2.0, n=1, species=("Na",), target=-1.0):
    """n^3 supercell of a simple cubic lattice."""
    coords, sp = [], []
    for i in range(n):
        for j in range(n):
            for k in range(n):
                coords.append([i / n, j / n, k / n])
                sp.append(species[(i + j + k) % len(species)])
    return {
        "lattice": np.eye(3) * a * n,
        "frac_coords": np.asarray(coords),
        "species": sp,
        "data": {"id": "sc", "e_above_hull": target, "e_form": target},
    }


def test_periodic_neighbors_simple_cubic():
    """Simple cubic: 6 nearest at distance a, 12 next at a*sqrt(2), ..."""
    s = simple_cubic(a=2.0)
    res = periodic_neighbors(s["lattice"], s["frac_coords"], radius=18.0,
                             max_nbr=18)
    assert res is not None
    nbr, shell, dist = res
    np.testing.assert_allclose(dist[0][:6], 2.0, rtol=1e-10)
    np.testing.assert_allclose(dist[0][6:18], 2.0 * np.sqrt(2), rtol=1e-10)
    assert list(shell[0][:6]) == [1] * 6
    assert list(shell[0][6:18]) == [2] * 12
    assert np.all(nbr[0] == 0)  # single atom cell: all images of itself


def test_periodic_neighbors_rejects_when_radius_too_small():
    s = simple_cubic(a=30.0)  # nearest neighbor at 30 A > radius 18
    res = periodic_neighbors(s["lattice"], s["frac_coords"], radius=18.0,
                             max_nbr=6)
    assert res is None


def test_shell_indices_monotone_multiatom():
    s = simple_cubic(a=3.0, n=2, species=("Na", "Cl"))
    res = periodic_neighbors(s["lattice"], s["frac_coords"], radius=18.0,
                             max_nbr=24)
    nbr, shell, dist = res
    assert shell.shape == (8, 24)
    for i in range(8):
        assert shell[i][0] == 1
        assert np.all(np.diff(shell[i]) >= 0)
        assert np.all(np.diff(dist[i]) >= -1e-12)


def featuriser16():
    rng = np.random.default_rng(42)
    table = {el: rng.standard_normal(16).astype(np.float32)
             for el in ("Na", "Cl", "K", "O")}
    return Featuriser(table)


def test_prepare_roundtrip(tmp_path):
    """build_dataset_prepare writes the reference schema; load_prepared reads
    it back into graphs identical to the direct prepare_graphs path."""
    entries = [simple_cubic(3.0, 2, ("Na", "Cl"), target=-8.0),
               simple_cubic(2.5, 2, ("K", "O"), target=-16.0)]
    d = build_dataset_prepare(entries, max_neighbor_number=24,
                              progress=False)
    assert set(d) == {"input", "batch_ids", "batch_comp", "target", "comps"}
    assert d["input"].shape[0] == 3
    # per-atom target scaling (prepare_data.py:139)
    assert np.isclose(d["target"]["e_above_hull"][0], -1.0)

    path = tmp_path / "prep.pickle.gz"
    with gzip.open(path, "wb") as f:
        pickle.dump(d, f)

    feat = featuriser16()
    graphs = load_prepared(str(path), featuriser=feat,
                           max_neighbor_number=24, target="e_above_hull")
    direct = prepare_graphs(entries, featuriser=feat,
                            target="e_above_hull", max_nbr=24)
    assert len(graphs) == len(direct) == 2
    for a, b in zip(graphs, direct):
        np.testing.assert_allclose(a.atom_fea, b.atom_fea)
        np.testing.assert_array_equal(a.edge_src, b.edge_src)
        np.testing.assert_array_equal(a.edge_dst, b.edge_dst)
        np.testing.assert_array_equal(a.edge_shell, b.edge_shell)
        np.testing.assert_allclose(a.comp_weight, b.comp_weight)
        assert np.isclose(a.target, b.target)
    # y = per-atom * n_atoms (data.py:139-141)
    assert np.isclose(graphs[0].target, -8.0)


def test_max_nbr_truncation(tmp_path):
    """load_prepared truncates stored 24-neighbor lists to max_nbr columns
    (data.py:116-120)."""
    entries = [simple_cubic(3.0, 2, ("Na", "Cl"), target=-8.0)]
    d = build_dataset_prepare(entries, max_neighbor_number=24, progress=False)
    g12 = load_prepared(d, featuriser=featuriser16(), max_neighbor_number=12,
                        target="e_above_hull")[0]
    assert g12.edge_src.shape == (8 * 12,)
    np.testing.assert_array_equal(
        g12.edge_shell.reshape(8, 12),
        np.asarray(d["input"][0][0])[:, :12])


def test_composition_regex_fallback():
    """String comps entries are parsed from the formula (data.py:64-73)."""
    entries = [simple_cubic(3.0, 2, ("Na", "Cl"), target=-8.0)]
    d = build_dataset_prepare(entries, max_neighbor_number=24, progress=False)
    d["comps"] = np.asarray(["parse-me"], dtype=object)  # force fallback
    d["batch_comp"] = np.asarray(["Na4Cl4"], dtype=object)
    g = load_prepared(d, featuriser=featuriser16(), target="e_above_hull")[0]
    assert g.atom_fea.shape == (8, 16)
    np.testing.assert_allclose(sorted(g.comp_weight), [0.5, 0.5])


def test_split_matches_sklearn_seed():
    tr, va, te = split_dataset(100, seed=0, val_size=0.1, test_size=0.1)
    assert len(te) == 10 and len(va) == 10 and len(tr) == 80
    assert not (set(tr) & set(va)) and not (set(tr) & set(te))
    tr2, va2, te2 = split_dataset(100, seed=0)
    assert tr == tr2 and va == va2 and te == te2


def test_loader_drop_last_modes():
    from cgat_tpu.data.synthetic import random_graphs
    graphs = random_graphs(0, 10, n_atoms_range=(3, 5), max_nbr=4, orig_fea=8)
    l1 = GraphLoader(graphs, 4, max_nbr=4, node_bucket=8)
    assert len(l1) == 2
    l2 = GraphLoader(graphs, 4, max_nbr=4, node_bucket=8, drop_last=False)
    assert len(l2) == 3
    batches = list(l2)
    assert int(np.sum(np.asarray(batches[-1].graph_mask))) == 2


def test_bundled_matscholar_embedding():
    feat = load_featuriser()
    assert feat.embedding_size == 200
    assert "H" in feat.allowed_types and "Pu" in feat.allowed_types
    assert feat.matrix(["Na", "Cl"]).shape == (2, 200)


def test_allow_incomplete_ragged_featurisation():
    """Legacy variant: sparse crystals keep shorter edge lists instead of
    being rejected (reference test_prepare_data.py:193-222)."""
    from cgat_tpu.data.featurizer import prepare_graphs
    sparse = simple_cubic(a=30.0, species=("Na", "Cl"))
    sparse["frac_coords"] = np.asarray([[0, 0, 0], [0.01, 0, 0]])
    sparse["species"] = ["Na", "Cl"]
    # strict mode rejects
    assert prepare_graphs([sparse], featuriser=featuriser16(),
                          target="e_above_hull", max_nbr=6) == []
    gs = prepare_graphs([sparse], featuriser=featuriser16(),
                        target="e_above_hull", max_nbr=6,
                        allow_incomplete=True)
    assert len(gs) == 1
    g = gs[0]
    assert 0 < len(g.edge_src) < 2 * 6   # fewer than max_nbr per atom
    assert np.all(g.edge_shell >= 1)


def test_featurization_cache_incremental(tmp_path, monkeypatch):
    """Second featurisation of overlapping structures skips the neighbor
    search entirely (AL rounds re-prepare overlapping sets round over round);
    cached output is identical, including rejections and ragged results."""
    import cgat_tpu.data.featurizer as fz
    from cgat_tpu.data.featurizer import FeaturizationCache

    entries = [simple_cubic(3.0, 2, ("Na", "Cl"), target=-8.0),
               simple_cubic(2.5, 2, ("K", "O"), target=-16.0)]
    sparse = simple_cubic(a=30.0)
    sparse["frac_coords"] = np.asarray([[0, 0, 0], [0.01, 0, 0]])
    sparse["species"] = ["Na", "Cl"]

    cache_dir = str(tmp_path / "fcache")
    cold = build_dataset_prepare(entries + [sparse], progress=False,
                                 max_neighbor_number=24, cache=cache_dir)
    plain = build_dataset_prepare(entries + [sparse], progress=False,
                                  max_neighbor_number=24)

    # warm pass: the search must never run again
    def _boom(*a, **k):
        raise AssertionError("neighbor search ran on a cached structure")
    monkeypatch.setattr(fz, "periodic_neighbors", _boom)
    monkeypatch.setattr(fz, "periodic_neighbors_ragged", _boom)
    cache = FeaturizationCache(cache_dir)
    warm = build_dataset_prepare(entries + [sparse], progress=False,
                                 max_neighbor_number=24, cache=cache)
    assert cache.hits == 3 and cache.misses == 0
    for d in (cold, warm):
        assert d["batch_ids"] == plain["batch_ids"]
        for row in range(3):
            for i in range(len(plain["batch_ids"])):
                np.testing.assert_array_equal(d["input"][row, i],
                                              plain["input"][row, i])

    # ragged results cache lazily on first allow_incomplete use...
    monkeypatch.undo()
    g_plain = prepare_graphs([sparse], featuriser=featuriser16(),
                             target="e_above_hull", max_nbr=24,
                             allow_incomplete=True)
    g_cold = prepare_graphs([sparse], featuriser=featuriser16(),
                            target="e_above_hull", max_nbr=24,
                            allow_incomplete=True, cache=cache_dir)
    # ...and then replay without any search
    monkeypatch.setattr(fz, "periodic_neighbors", _boom)
    monkeypatch.setattr(fz, "periodic_neighbors_ragged", _boom)
    g_warm = prepare_graphs([sparse], featuriser=featuriser16(),
                            target="e_above_hull", max_nbr=24,
                            allow_incomplete=True, cache=cache_dir)
    for g in (g_cold[0], g_warm[0]):
        np.testing.assert_array_equal(g.edge_src, g_plain[0].edge_src)
        np.testing.assert_array_equal(g.edge_dst, g_plain[0].edge_dst)
        np.testing.assert_array_equal(g.edge_shell, g_plain[0].edge_shell)

    # different geometry/params = different key: no false hits
    c = FeaturizationCache(cache_dir)
    s = entries[0]
    k1 = c.key(s["lattice"], s["frac_coords"], 18.0, 24)
    assert c.key(s["lattice"] * 1.001, s["frac_coords"], 18.0, 24) != k1
    assert c.key(s["lattice"], s["frac_coords"], 18.0, 12) != k1
    assert c.get(c.key(s["lattice"], s["frac_coords"], 17.0, 24)) is None


def test_edge_slot_sizing_and_invariance():
    """Edge slots size to real edges (biggest padding-waste lever), never to
    N*max_nbr on sparse graphs — and the model output is invariant to the
    edge-slot count."""
    import jax
    from cgat_tpu.data.batching import collate
    from cgat_tpu.data.dataset import GraphLoader
    from cgat_tpu.data.synthetic import random_graphs
    from cgat_tpu.models import CGATConfig, CGAtNet

    graphs = random_graphs(0, 6, n_atoms_range=(4, 8), max_nbr=24,
                           orig_fea=16)  # real degree <= 7 << 24
    tight = collate(graphs, max_nbr=24, node_bucket=8)
    full = collate(graphs, max_nbr=24, node_bucket=8,
                   num_edge_slots=tight.num_node_slots * 24)
    e_real = sum(len(g.edge_src) for g in graphs)
    assert tight.num_edge_slots < full.num_edge_slots
    assert e_real <= tight.num_edge_slots <= e_real + 8 * 24
    # loader path: E = N * dataset max degree, one shape family
    loader = GraphLoader(graphs, 3, max_nbr=24, node_bucket=8)
    assert loader.max_degree <= 7
    for b in loader:
        assert b.num_edge_slots == b.num_node_slots * loader.max_degree

    cfg = CGATConfig(orig_elem_fea_len=16, elem_fea_len=8, n_graph=2,
                     nbr_embedding_size=8, neighbor_number=24, msg_heads=2,
                     n_graph_roost=1, out_hidden=(8,))
    model = CGAtNet(cfg)
    params = model.init(jax.random.key(0), tight)["params"]
    out_t = np.asarray(model.apply({"params": params}, tight))
    out_f = np.asarray(model.apply({"params": params}, full))
    np.testing.assert_allclose(out_t, out_f, rtol=1e-5, atol=1e-6)


def test_build_dataset_prepare_parallel_matches_serial(tmp_path):
    """workers>1 must reproduce the serial prepared dict exactly (order,
    values), including through a shared on-disk cache."""
    from cgat_tpu.data.featurizer import build_dataset_prepare
    from cgat_tpu.data.structures import random_structures
    structures = random_structures(5, 24, noise=0.01, strain=0.01)
    serial = build_dataset_prepare(structures, progress=False)
    par = build_dataset_prepare(structures, progress=False, workers=3,
                                cache=str(tmp_path / "cache"))
    assert serial["batch_ids"] == par["batch_ids"]
    assert list(serial["batch_comp"]) == list(par["batch_comp"])
    for k in serial["target"]:
        np.testing.assert_array_equal(serial["target"][k], par["target"][k])
    for row in range(3):
        for i in range(len(serial["batch_ids"])):
            np.testing.assert_array_equal(serial["input"][row][i],
                                          par["input"][row][i])
    # cache warm now: a second parallel run replays from disk identically
    par2 = build_dataset_prepare(structures, progress=False, workers=2,
                                 cache=str(tmp_path / "cache"))
    np.testing.assert_array_equal(par["input"][0][0], par2["input"][0][0])
