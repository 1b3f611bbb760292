"""Synthetic crystal-graph generation for tests and benchmarks.

Generates random graphs with the structural invariants the featurizer
guarantees (reference prepare_data.py:146-169): fixed out-degree ``max_nbr``
per atom, monotone shell indices starting at 1, self-edges excluded, and a
composition graph over the distinct "elements" of the crystal.
"""
from __future__ import annotations

import numpy as np

from .batching import CrystalGraph


def random_graph(rng: np.random.Generator, *, n_atoms: int, max_nbr: int = 24,
                 orig_fea: int = 200, n_species: int = 8,
                 target_scale: float = 1.0,
                 full_degree: bool = False) -> CrystalGraph:
    """One random crystal graph. Species features are random but consistent
    within the graph (same species -> same feature row), matching how real
    element embeddings behave.

    ``full_degree=True`` gives every atom exactly ``max_nbr`` neighbors by
    sampling WITH replacement — the density of real featurizer output, where
    periodic images make the same neighbor atom appear at several shells
    (prepare_data.py:146-169 keeps the 24 nearest periodic neighbors)."""
    if full_degree and n_atoms > 1:
        k = max_nbr
    else:
        k = min(max_nbr, max(1, n_atoms - 1)) if n_atoms > 1 else 1
    species = rng.integers(0, n_species, size=n_atoms)
    species_fea = rng.standard_normal((n_species, orig_fea)).astype(np.float32)
    atom_fea = species_fea[species]

    src, dst, shell = [], [], []
    for i in range(n_atoms):
        if n_atoms == 1:
            nbrs = np.array([0])
        else:
            others = np.delete(np.arange(n_atoms), i)
            nbrs = rng.choice(others, size=k, replace=(len(others) < k))
        src.extend([i] * len(nbrs))
        dst.extend(nbrs.tolist())
        # shell index: non-decreasing from 1, random increments
        s = np.cumsum(rng.random(len(nbrs)) < 0.4).astype(np.int64) + 1
        shell.extend(np.minimum(s, max_nbr).tolist())

    uniq, counts = np.unique(species, return_counts=True)
    comp_fea = species_fea[uniq]
    comp_weight = (counts / counts.sum()).astype(np.float32)

    return CrystalGraph(
        atom_fea=atom_fea,
        edge_src=np.asarray(src, np.int32),
        edge_dst=np.asarray(dst, np.int32),
        edge_shell=np.asarray(shell, np.int32),
        comp_fea=comp_fea,
        comp_weight=comp_weight,
        target=float(rng.standard_normal() * target_scale),
        cry_id=int(rng.integers(0, 1 << 30)),
        composition="synthetic",
    )


def random_graphs(seed: int, n_graphs: int, *, n_atoms_range=(4, 10),
                  max_nbr: int = 24, orig_fea: int = 200,
                  full_degree: bool = False):
    rng = np.random.default_rng(seed)
    return [
        random_graph(rng, n_atoms=int(rng.integers(*n_atoms_range)),
                     max_nbr=max_nbr, orig_fea=orig_fea,
                     full_degree=full_degree)
        for _ in range(n_graphs)
    ]


def to_oracle_inputs(graphs):
    """Concatenate unpadded arrays in reference collate order
    (roost_message.py:400-458): node/edge offsetting plus the roost
    composition edge lists built like data.py:90-96."""
    nodes, src, dst, shell, node2graph = [], [], [], [], []
    cfea, cw, cself, cnbr, ccry = [], [], [], [], []
    nbase = 0
    cbase = 0
    for gi, g in enumerate(graphs):
        n = g.n_atoms
        nodes.append(g.atom_fea)
        src.append(g.edge_src.astype(np.int64) + nbase)
        dst.append(g.edge_dst.astype(np.int64) + nbase)
        shell.append(g.edge_shell)
        node2graph.extend([gi] * n)
        r = g.comp_fea.shape[0]
        cfea.append(g.comp_fea)
        cw.append(g.comp_weight.reshape(-1, 1))
        env = list(range(r))
        for i in range(r):
            cself.extend([i + cbase] * (r - 1))
            cnbr.extend([e + cbase for e in env[:i] + env[i + 1:]])
        ccry.extend([gi] * r)
        nbase += n
        cbase += r
    return dict(
        nodes=np.concatenate(nodes),
        edge_src=np.concatenate(src),
        edge_dst=np.concatenate(dst),
        edge_shell=np.concatenate(shell),
        node2graph=np.asarray(node2graph, np.int64),
        comp_fea=np.concatenate(cfea),
        comp_weights=np.concatenate(cw),
        comp_self_idx=np.asarray(cself, np.int64),
        comp_nbr_idx=np.asarray(cnbr, np.int64),
        comp_cry_idx=np.asarray(ccry, np.int64),
    )
