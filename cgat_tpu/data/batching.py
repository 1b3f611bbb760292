"""Static-shape batched crystal graphs (struct-of-arrays).

Replaces the reference's dynamic PyG ``Batch.from_data_list`` +
``collate_batch`` (reference: CGAT/lightning_module.py:199-202,
CGAT/roost_message.py:400-458) with padded/bucketed arrays whose shapes are
static under ``jit``:

* nodes + edges of all crystals concatenated with index offsetting,
* edge arrays **sorted by destination node** so segment reductions see sorted
  ids (TPU scatter fast path),
* the roost composition graph stored **dense per crystal** ``(C, R, ...)``
  instead of edge lists — the composition graph is complete over the distinct
  elements of a crystal (reference data.py:90-96), so with R padded slots all
  pair interactions become masked dense ``(C, R, R)`` MXU work.

Padding protocol: padded nodes/edges/slots are masked; padded edges point at
node slot ``num_node_slots - 1`` and padded nodes belong to graph slot
``num_graphs - 1`` — always masked in reductions so they contribute zero.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class CrystalBatch:
    """One batch of crystal graphs with static shapes.

    Shapes: N node slots, E edge slots, C graph slots, R composition slots.
    """
    # structure graph
    nodes: jnp.ndarray        # f32 (N, orig_fea)  atom features (matscholar)
    node_mask: jnp.ndarray    # bool (N,)
    node2graph: jnp.ndarray   # i32 (N,) sorted crystal id per node
    edge_src: jnp.ndarray     # i32 (E,) source node ("self_fea_idx")
    edge_dst: jnp.ndarray     # i32 (E,) destination node ("nbr_fea_idx"), sorted
    edge_shell: jnp.ndarray   # i32 (E,) distance-shell index (1..max_nbr)
    edge_mask: jnp.ndarray    # bool (E,)
    # composition (roost) graph, dense per crystal
    comp_fea: jnp.ndarray     # f32 (C, R, orig_fea) distinct-element features
    comp_weight: jnp.ndarray  # f32 (C, R) fractional weights
    comp_mask: jnp.ndarray    # bool (C, R)
    # targets
    target: jnp.ndarray       # f32 (C,) training target (already y = per-atom * n_atoms)
    graph_mask: jnp.ndarray   # bool (C,)
    # edge-partition halo structure (only when collated with edge_shards > 1;
    # None otherwise). Shapes use S = edge_shards, H = halo slots per
    # (owner, destination) shard pair, n_loc = N / S local nodes per shard,
    # Eh = S * halo-block capacity.
    #
    # With edge sharding the per-shard edge block is SPLIT: the primary
    # edge arrays above hold only the LOCAL-src edges (source and destination
    # in the shard's own node slice) and the ``halo_*`` arrays hold the
    # HALO-src edges (destination local, source owned by another shard).
    # Each sub-block is dst-sorted with False-suffix padding. The split is
    # what gives the layer comm/compute overlap: the local block's per-edge
    # matmuls depend only on the local node slice, so they run while the
    # boundary ``all_to_all`` is in flight; only the (small) halo block
    # consumes the received rows (models/cgat.py).
    halo_src: jnp.ndarray | None = None       # i32 (Eh,) global source ids
    halo_dst: jnp.ndarray | None = None       # i32 (Eh,) global dst ids
    halo_shell: jnp.ndarray | None = None     # i32 (Eh,)
    halo_mask: jnp.ndarray | None = None      # bool (Eh,)
    # Per-halo-edge source index into [local nodes | received halo rows]:
    # n_loc + owner*H + position in the owner's send list for this shard
    # (padded entries point at local row n_loc - 1).
    halo_src_ext: jnp.ndarray | None = None   # i32 (Eh,)
    # Send table, owner-major: rows [s*S:(s+1)*S] belong to shard s; row
    # s*S + d holds the LOCAL indices of the boundary nodes shard s sends to
    # shard d (sorted by global id, padded with n_loc - 1). An
    # ``all_to_all`` of ``x[halo_send_idx]`` delivers exactly the boundary
    # features each shard needs — comm per layer is O(S*H*F), proportional
    # to the partition boundary, not O(N*F) like a full all_gather.
    halo_send_idx: jnp.ndarray | None = None  # i32 (S*S, H)
    # Stable argsort of ``edge_src`` (ops/gather.py CSR backward). Layout
    # depends on the collate mode: single-shard collates ship the global
    # argsort (values in [0, E)); edge-sharded collates ship a PER-SHARD
    # argsort of each local-src block with BLOCK-LOCAL values (shard s's
    # segment [s*cap, (s+1)*cap) holds argsort(edge_src[s*cap:(s+1)*cap]),
    # values in [0, cap)) — exactly what each shard_map cell needs for its
    # local gather backward; meaningless to index with globally.
    edge_src_perm: jnp.ndarray | None = None  # i32 (E,)
    # Host-precomputed UNCLAMPED CSR row pointers:
    # offn[k] = first position in the sorted id array with id >= k. The
    # device consumers (the segment-attention wrappers and the gather
    # plans) slice the prefix they need and clamp by the real-row count —
    # removing every per-step ``jnp.searchsorted`` (14-iteration
    # binary-search while-loops XLA cannot CSE away, ~0.5 ms/step at
    # flagship dims, round-5 trace). Lengths carry OFFN_MARGIN slack past
    # the segment count so any kernel block policy's backward window fits.
    # Layout depends on the collate mode, mirroring ``edge_src_perm``:
    # single-shard collates ship GLOBAL arrays (L = N + margin + 1);
    # edge-sharded collates ship PER-SHARD arrays over BLOCK-LOCAL ids,
    # shard-major flat (S * L rows, L = N/S + margin + 1) so a shard_map
    # cell's slice is exactly its local block's pointers.
    edge_dst_offn: jnp.ndarray | None = None    # i32 (L,) | (S*L,)
    edge_src_offn: jnp.ndarray | None = None    # i32 (L,) | (S*L,)
    # edge_src pre-sorted ascending (== edge_src[edge_src_perm], block-local
    # values per shard under edge sharding; saves the per-step device
    # sort-gather)
    edge_src_sorted: jnp.ndarray | None = None  # i32 (E,)
    # single-shard collates only (the sharded pool completes the softmax
    # with collectives instead)
    node2graph_offn: jnp.ndarray | None = None  # i32 (C + margin + 1,)
    # per-shard pointers over the HALO block's (block-local) destinations;
    # edge-sharded collates only
    halo_dst_offn: jnp.ndarray | None = None    # i32 (S*L,)

    @property
    def num_node_slots(self) -> int:
        return self.nodes.shape[0]

    @property
    def num_graphs(self) -> int:
        return self.target.shape[0]

    @property
    def num_edge_slots(self) -> int:
        return self.edge_src.shape[0]


@dataclasses.dataclass
class CrystalGraph:
    """Host-side featurised crystal (numpy). One entry of a prepared dataset."""
    atom_fea: np.ndarray      # (n, orig_fea) f32
    edge_src: np.ndarray      # (n*k,) i32   self_fea_idx
    edge_dst: np.ndarray      # (n*k,) i32   nbr_fea_idx
    edge_shell: np.ndarray    # (n*k,) i32
    comp_fea: np.ndarray      # (r, orig_fea) f32 distinct elements
    comp_weight: np.ndarray   # (r,) f32
    target: float             # per-crystal training target (already scaled)
    cry_id: object = None
    composition: str = ""

    @property
    def n_atoms(self) -> int:
        return self.atom_fea.shape[0]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# slack past the segment count in host-precomputed CSR pointer arrays: must
# cover the widest backward gather window any kernel block policy can ask
# for (<= BLOCK_EDGES 768 + alignment 16) plus the 128-lane node-block
# round-up of the forward grid
OFFN_MARGIN = 1024


def host_offsets(sorted_ids: np.ndarray, n_hi: int) -> np.ndarray:
    """Unclamped CSR row pointers of a sorted id array, computed host-side:
    ``off[k] = searchsorted(sorted_ids, k)`` for k in [0, n_hi]. Matches
    the device ``_node_offsets`` (ops/pallas/segment_attention.py) after
    the consumer clamps entries to its real-row count."""
    off = np.zeros((n_hi + 1,), np.int32)
    off[1:] = np.searchsorted(sorted_ids, np.arange(1, n_hi + 1),
                              side="left").astype(np.int32)
    return off


def pad_to_bucket(n: int, multiple: int = 64) -> int:
    """Round a size up to the padding bucket (limits recompilation)."""
    return max(multiple, _round_up(n, multiple))


def edge_shard_counts(graphs: Sequence["CrystalGraph"],
                      num_node_slots: int,
                      edge_shards: int) -> tuple[np.ndarray, np.ndarray]:
    """(local, halo) real-edge counts per destination-node slice for a
    prospective collate of ``graphs`` into ``num_node_slots`` (used to pick
    the static per-shard local/halo edge capacities before building the
    batch). Local = source and destination in the same slice."""
    n_loc = num_node_slots // edge_shards
    loc = np.zeros((edge_shards,), np.int64)
    hal = np.zeros((edge_shards,), np.int64)
    base = 0
    for g in graphs:
        src = g.edge_src.astype(np.int64) + base
        dst = g.edge_dst.astype(np.int64) + base
        d = dst // n_loc
        lm = (src // n_loc) == d
        loc += np.bincount(d[lm], minlength=edge_shards)
        hal += np.bincount(d[~lm], minlength=edge_shards)
        base += g.n_atoms
    return loc, hal


def halo_pair_max(graphs: Sequence["CrystalGraph"],
                  num_node_slots: int, edge_shards: int) -> int:
    """Largest per-(destination, owner) boundary-node count for a
    prospective collate of ``graphs`` (used to pick a static halo capacity
    shared across a stacked group before building the batches)."""
    S = edge_shards
    n_loc = num_node_slots // S
    src_l, dst_l, base = [], [], 0
    for g in graphs:
        src_l.append(g.edge_src.astype(np.int64) + base)
        dst_l.append(g.edge_dst.astype(np.int64) + base)
        base += g.n_atoms
    if not src_l:
        return 0
    src = np.concatenate(src_l)
    dst = np.concatenate(dst_l)
    dest_shard = dst // n_loc
    owner = src // n_loc
    worst = 0
    for s in range(S):
        m = dest_shard == s
        for j in range(S):
            if j == s:
                continue
            worst = max(worst, len(np.unique(src[m & (owner == j)])))
    return worst


def _halo_layout(halo_src, halo_mask, n_loc, S, cap, halo_slots):
    """Boundary (halo) exchange structure for an edge-sharded batch.

    ``halo_src`` holds the S halo blocks' global source ids (``cap`` slots
    each). Returns (halo_src_ext (S*cap,), halo_send_idx (S*S, H), H). See
    :class:`CrystalBatch` for the layout contract.
    """
    need = [[None] * S for _ in range(S)]
    for s in range(S):
        blk = slice(s * cap, (s + 1) * cap)
        gsrc = halo_src[blk].astype(np.int64)
        owner = gsrc // n_loc
        msk = halo_mask[blk]
        for j in range(S):
            if j != s:
                need[s][j] = np.unique(gsrc[msk & (owner == j)])
    worst = max((len(need[s][j]) for s in range(S) for j in range(S)
                 if j != s), default=0)
    H = halo_slots if halo_slots is not None else max(8, _round_up(worst, 8))
    assert worst <= H, f"halo overflow: {worst} boundary nodes > {H} slots"

    src_ext = np.full((S * cap,), n_loc - 1, np.int32)
    for s in range(S):
        blk = slice(s * cap, (s + 1) * cap)
        gsrc = halo_src[blk].astype(np.int64)
        owner = gsrc // n_loc
        msk = halo_mask[blk]
        ext = np.full((cap,), n_loc - 1, np.int64)
        for j in range(S):
            if j == s:
                continue
            m = msk & (owner == j)
            if m.any():
                ext[m] = n_loc + j * H + np.searchsorted(need[s][j], gsrc[m])
        src_ext[blk] = ext

    halo_send = np.full((S * S, H), n_loc - 1, np.int32)
    for d in range(S):
        for j in range(S):
            if j == d:
                continue
            ids = need[d][j]
            halo_send[j * S + d, :len(ids)] = ids - j * n_loc
    return src_ext, halo_send, H


def collate(graphs: Sequence[CrystalGraph],
            *,
            num_graphs: int | None = None,
            num_node_slots: int | None = None,
            num_comp_slots: int | None = None,
            max_nbr: int = 24,
            node_bucket: int = 64,
            orig_fea: int | None = None,
            edge_shards: int = 1,
            edge_slots_per_shard: int | None = None,
            num_edge_slots: int | None = None,
            max_degree: int | None = None,
            halo_edge_slots: int | None = None,
            halo_slots: int | None = None) -> CrystalBatch:
    """Build a static-shape :class:`CrystalBatch` from host graphs.

    Mirrors the index-offsetting of the reference collate fns
    (roost_message.py:435-452) then sorts edges by destination and pads.

    ``edge_shards > 1`` splits the edge axis into S contiguous LOCAL-src
    blocks of ``edge_slots_per_shard`` slots (primary edge arrays) plus S
    HALO-src blocks of ``halo_edge_slots`` slots (``halo_*`` arrays); block
    ``s`` of each holds exactly the edges whose destination lies in node
    slice ``[s*N/S, (s+1)*N/S)`` (dst-sorted within the block, suffix
    padding pointing at the slice's last node). A ``shard_map`` over an
    ``edge`` mesh axis aggregates each block pair into its local node slice
    with no cross-shard scatter, and the local block carries no data
    dependence on the boundary ``all_to_all`` — the per-edge matmuls
    overlap the exchange (SURVEY.md section 5.7 edge partitioning).
    """
    C = num_graphs if num_graphs is not None else len(graphs)
    assert len(graphs) <= C, "more graphs than slots"
    n_real_nodes = sum(g.n_atoms for g in graphs)
    n_real_edges = sum(len(g.edge_src) for g in graphs)
    N = num_node_slots if num_node_slots is not None else pad_to_bucket(
        n_real_nodes, node_bucket * edge_shards)
    assert n_real_nodes <= N
    assert N % edge_shards == 0, (N, edge_shards)
    # edge-slot sizing (per-edge matmuls dominate the step, so slack here is
    # the biggest padding-waste lever): explicit ``num_edge_slots`` > stable
    # family ``N * max_degree`` (loaders pass the dataset's real max degree;
    # == max_nbr on featurizer output, smaller on sparse graphs) > tight
    # per-batch bucket. Never above N * max_nbr (a graph has <= max_nbr
    # edges per atom after featurizer truncation).
    if num_edge_slots is not None:
        E = num_edge_slots
    elif max_degree is not None:
        E = N * min(max_degree, max_nbr)
    else:
        E = min(N * max_nbr, pad_to_bucket(n_real_edges, 8 * max_nbr))
    assert n_real_edges <= E, (n_real_edges, E)
    R = num_comp_slots if num_comp_slots is not None else max(
        (g.comp_fea.shape[0] for g in graphs), default=1)
    F = orig_fea if orig_fea is not None else (
        graphs[0].atom_fea.shape[1] if graphs else 200)

    nodes = np.zeros((N, F), np.float32)
    node_mask = np.zeros((N,), bool)
    node2graph = np.full((N,), C - 1, np.int32)
    src_l, dst_l, shell_l = [], [], []
    comp_fea = np.zeros((C, R, F), np.float32)
    comp_weight = np.zeros((C, R), np.float32)
    comp_mask = np.zeros((C, R), bool)
    target = np.zeros((C,), np.float32)
    graph_mask = np.zeros((C,), bool)

    base = 0
    for gi, g in enumerate(graphs):
        n = g.n_atoms
        nodes[base:base + n] = g.atom_fea
        node_mask[base:base + n] = True
        node2graph[base:base + n] = gi
        src_l.append(g.edge_src.astype(np.int64) + base)
        dst_l.append(g.edge_dst.astype(np.int64) + base)
        shell_l.append(g.edge_shell)
        r = g.comp_fea.shape[0]
        assert r <= R, f"crystal has {r} distinct elements > {R} slots"
        comp_fea[gi, :r] = g.comp_fea
        comp_weight[gi, :r] = g.comp_weight
        comp_mask[gi, :r] = True
        target[gi] = g.target
        graph_mask[gi] = True
        base += n

    if src_l:
        src = np.concatenate(src_l)
        dst = np.concatenate(dst_l)
        shell = np.concatenate(shell_l).astype(np.int64)
        order = np.argsort(dst, kind="stable")
        src, dst, shell = src[order], dst[order], shell[order]
    else:
        src = dst = shell = np.zeros((0,), np.int64)

    e = len(src)
    assert e <= E
    halo = None
    if edge_shards > 1:
        S = edge_shards
        n_loc = N // S
        # per-shard edge ranges from the dst-sorted array, then a stable
        # local/halo partition within each (selection on a sorted array
        # keeps each sub-block dst-sorted)
        bounds = np.searchsorted(dst, np.arange(1, S + 1) * n_loc,
                                 side="left")
        starts = np.concatenate([[0], bounds[:-1]])
        owner = src // n_loc
        loc_counts = np.zeros((S,), np.int64)
        hal_counts = np.zeros((S,), np.int64)
        parts = []
        for s in range(S):
            sl = slice(starts[s], bounds[s])
            lm = owner[sl] == s
            parts.append(lm)
            loc_counts[s] = int(lm.sum())
            hal_counts[s] = int(len(lm) - lm.sum())
        if edge_slots_per_shard is None:
            # round up to a whole number of max_nbr rows per shard so shard
            # capacity stays a small set of shapes across batches
            cap = int(pad_to_bucket(max(int(loc_counts.max()), 1) if e else 1,
                                    8 * max_nbr))
        else:
            cap = edge_slots_per_shard
        cap_h = (halo_edge_slots if halo_edge_slots is not None
                 else int(pad_to_bucket(max(int(hal_counts.max()), 1), 16)))
        assert (loc_counts <= cap).all(), \
            f"edge shard overflow: {loc_counts.tolist()} > {cap} slots"
        assert (hal_counts <= cap_h).all(), \
            f"halo edge overflow: {hal_counts.tolist()} > {cap_h} slots"
        E = S * cap
        Eh = S * cap_h
        edge_src = np.empty((E,), np.int32)
        edge_dst = np.empty((E,), np.int32)
        edge_shell = np.zeros((E,), np.int32)
        edge_mask = np.zeros((E,), bool)
        halo_src = np.empty((Eh,), np.int32)
        halo_dst = np.empty((Eh,), np.int32)
        halo_shell = np.zeros((Eh,), np.int32)
        halo_mask = np.zeros((Eh,), bool)
        for s in range(S):
            last = (s + 1) * n_loc - 1  # padding target inside slice s
            sl = slice(starts[s], bounds[s])
            lm = parts[s]
            for arr_s, arr_d, arr_sh, arr_m, c0, m in (
                    (edge_src, edge_dst, edge_shell, edge_mask,
                     s * cap, lm),
                    (halo_src, halo_dst, halo_shell, halo_mask,
                     s * cap_h, ~lm)):
                width = cap if arr_s is edge_src else cap_h
                arr_s[c0:c0 + width] = last
                arr_d[c0:c0 + width] = last
                c = int(m.sum())
                arr_s[c0:c0 + c] = src[sl][m]
                arr_d[c0:c0 + c] = dst[sl][m]
                arr_sh[c0:c0 + c] = shell[sl][m]
                arr_m[c0:c0 + c] = True
        halo_src_ext, halo_send_idx, _ = _halo_layout(
            halo_src, halo_mask, n_loc, S, cap_h, halo_slots)
        # per-shard stable argsort of the local-src block (block-local
        # values): each shard_map cell's CSR gather backward permutes its
        # own (cap,)-slice with its own perm slice
        src_perm = np.empty((E,), np.int32)
        for s in range(S):
            blk = slice(s * cap, (s + 1) * cap)
            src_perm[blk] = np.argsort(edge_src[blk],
                                       kind="stable").astype(np.int32)
        # per-shard host CSR pointers over BLOCK-LOCAL ids (shard-major
        # flat, so a shard_map cell's `edge`-axis slice is its own block's
        # pointers) — the in-cell production kernels then run with zero
        # per-step searchsorted, same as the single-chip step
        L = n_loc + OFFN_MARGIN + 1
        dst_offn = np.empty((S * L,), np.int32)
        src_offn = np.empty((S * L,), np.int32)
        src_sorted = np.empty((E,), np.int32)
        halo_offn = np.empty((S * L,), np.int32)
        for s in range(S):
            blk = slice(s * cap, (s + 1) * cap)
            row = slice(s * L, (s + 1) * L)
            dst_offn[row] = host_offsets(
                edge_dst[blk].astype(np.int64) - s * n_loc,
                n_loc + OFFN_MARGIN)
            ss = (edge_src[blk][src_perm[blk]].astype(np.int64)
                  - s * n_loc).astype(np.int32)
            src_sorted[blk] = ss
            src_offn[row] = host_offsets(ss, n_loc + OFFN_MARGIN)
            hblk = slice(s * cap_h, (s + 1) * cap_h)
            halo_offn[row] = host_offsets(
                halo_dst[hblk].astype(np.int64) - s * n_loc,
                n_loc + OFFN_MARGIN)
        offsets = dict(edge_dst_offn=jnp.asarray(dst_offn),
                       edge_src_offn=jnp.asarray(src_offn),
                       edge_src_sorted=jnp.asarray(src_sorted))
        halo = dict(
            halo_src=jnp.asarray(halo_src),
            halo_dst=jnp.asarray(halo_dst),
            halo_shell=jnp.asarray(halo_shell),
            halo_mask=jnp.asarray(halo_mask),
            halo_src_ext=jnp.asarray(halo_src_ext),
            halo_send_idx=jnp.asarray(halo_send_idx),
            halo_dst_offn=jnp.asarray(halo_offn))
    else:
        edge_src = np.full((E,), N - 1, np.int32)
        edge_dst = np.full((E,), N - 1, np.int32)
        edge_shell = np.zeros((E,), np.int32)
        edge_mask = np.zeros((E,), bool)
        edge_src[:e] = src
        edge_dst[:e] = dst
        edge_shell[:e] = shell
        edge_mask[:e] = True

    if halo:
        src_perm_full = src_perm
    else:
        src_perm_full = np.argsort(edge_src, kind="stable").astype(np.int32)
        # host-precomputed CSR pointers for the step's segment ops (see the
        # CrystalBatch field docs); single-shard layouts only — the sorted
        # arrays here are globally dst/src-sorted with a strict False-suffix
        src_sorted = edge_src[src_perm_full]
        offsets = dict(
            edge_dst_offn=jnp.asarray(
                host_offsets(edge_dst, N + OFFN_MARGIN)),
            edge_src_offn=jnp.asarray(
                host_offsets(src_sorted, N + OFFN_MARGIN)),
            edge_src_sorted=jnp.asarray(src_sorted),
            node2graph_offn=jnp.asarray(
                host_offsets(node2graph, C + OFFN_MARGIN)))

    collate.last_counts = {"edges": int(e), "graphs": len(graphs),
                           "nodes": int(n_real_nodes)}
    return CrystalBatch(
        nodes=jnp.asarray(nodes),
        node_mask=jnp.asarray(node_mask),
        node2graph=jnp.asarray(node2graph),
        edge_src=jnp.asarray(edge_src),
        edge_dst=jnp.asarray(edge_dst),
        edge_shell=jnp.asarray(edge_shell),
        edge_mask=jnp.asarray(edge_mask),
        edge_src_perm=jnp.asarray(src_perm_full),
        **offsets,
        comp_fea=jnp.asarray(comp_fea),
        comp_weight=jnp.asarray(comp_weight),
        comp_mask=jnp.asarray(comp_mask),
        target=jnp.asarray(target),
        graph_mask=jnp.asarray(graph_mask),
        **(halo or {}),
    )
