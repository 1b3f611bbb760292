"""CGAtNet: crystal-graph attention network (flax.linen, TPU-native).

Re-implementation of the reference model family (reference: CGAT/CGAT.py).
Structure-aware property model over static padded crystal batches:

  trainable element embedding -> shell-index edge embedding -> n_graph x
  (node attention MP [+ edge MLP/hyper update]) with residual adds ->
  Roost composition feature -> global multi-head attention pool ->
  deep residual output head emitting (output, log_std).

Reference quirks preserved for activation parity:
* PyG flow semantics: for an edge ``(self_idx, nbr_idx)`` messages aggregate
  at ``nbr_idx`` and the softmax segments are ``nbr_idx`` (MessagePassing
  ``source_to_target``; CGAT.py:275, 313-326). Message concat order is
  ``[x_dst, edge_attr, x_src]``.
* GATConvEdges under the default ``no_hyper=True`` overwrites its attention
  aggregate with ``Pooling_NN(edge_attr)`` (CGAT.py:224-225): the default edge
  update is an MLP of the edge feature and the attention branch is dead. We
  keep the dead branch's parameters (checkpoint parity) but skip computing it.
* Node updates always use hypernetworks: H_Net_0 on layer 0, H_Net after
  (CGAT.py:300-305; ``final`` is never set by CGAtNet).
* ``mean_pooling=False`` is the effective default (the trainer passes the
  negated flag, lightning_module.py:170) so pooled heads are concatenated and
  the output head input is ``elem_fea_len * msg_heads``.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..data.batching import CrystalBatch
from ..ops.attention import edge_softmax_aggregate, edge_softmax_aggregate_pair
from ..ops.gather import gather_rows
from ..ops.segment import segment_softmax, segment_softmax_pair, segment_sum
from .blocks import MultiHeadNetwork, ResidualNetwork, TorchLinear
from .hyper import HNet, HNet0
from .roost import Roost


@dataclasses.dataclass(frozen=True)
class CGATConfig:
    """Model hyperparameters; defaults = reference effective defaults
    (lightning_module.py:426-593 with the store_false inversions resolved,
    see SURVEY.md section 2.2)."""
    orig_elem_fea_len: int = 200
    elem_fea_len: int = 128
    n_graph: int = 5
    nbr_embedding_size: int = 128
    neighbor_number: int = 24
    mean_pooling: bool = False        # heads concatenated (effective default)
    rezero: bool = True
    msg_heads: int = 5
    update_edges: bool = True
    vector_attention: bool = True
    global_vector_attention: bool = True
    n_graph_roost: int = 3
    no_hyper: bool = True
    dropout: float = 0.0
    out_hidden: tuple = (1024, 1024, 512, 512, 256, 256, 128)
    compute_dtype: str = "float32"    # "bfloat16" for mixed precision
    # project node features through the MH fc_in PER NODE and gather the
    # projections per edge, instead of projecting the per-edge
    # [x_dst, e, x_src] concat (exact linear decomposition, same params;
    # cuts per-edge fc_in FLOPs to the edge-feature third). A/B'd on
    # hardware before flipping the default (docs/PERFORMANCE.md round 3)
    split_projection: bool = False
    remat: bool = False               # rematerialise MP layers in backward
    hyper_remat: bool = False         # rematerialise only the HyperLinears
    #   (selective: recompute the (B, out*in+out) predicted-param tensors in
    #   backward instead of keeping them live — they dominate activation HBM
    #   at large batch; far cheaper than full-layer remat)

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32

    @property
    def embedding_dim(self) -> int:
        """Graph-embedding width (gaussian_process.py:89)."""
        return (self.elem_fea_len if self.mean_pooling
                else self.elem_fea_len * self.msg_heads)


class GATConvNodes(nn.Module):
    """Node attention message passing (CGAT.py:233-335).

    Per edge: concat [x_dst, e, x_src] -> multi-head gate + message MLPs ->
    segment softmax over edges incident at dst -> weighted scatter-add ->
    mean over heads -> hypernetwork update.
    """
    in_channels: int
    out_channels: int
    nbr_channels: int
    heads: int = 1
    vector_attention: bool = False
    first: bool = False
    final: bool = False
    dropout: float = 0.0
    dtype: jnp.dtype | None = None
    hyper_remat: bool = False
    split_projection: bool = False
    pair_backend: str | None = None   # aggregation backend for halo pairs
    # per-block layout invariants (dst-sorted, False-suffix mask, local ids)
    # hold for the PRIMARY edge arrays even though ``halo`` is present —
    # true inside a shard_map cell (each device sees exactly one shard's
    # local block), false for the single-device consumption of a sharded
    # layout (blocks concatenated, padding interleaved). Gates the fused
    # kernels + CSR gather backward in halo mode.
    halo_blocked: bool = False

    @nn.compact
    def __call__(self, x, edge_src, edge_dst, edge_attr, x_0, edge_mask,
                 *, deterministic=True, halo=None, src_perm=None,
                 gather_plans=None, dst_offn=None, halo_dst_offn=None):
        """Edge-sharded mode (``halo`` is not None — inside a ``shard_map``
        over an edge axis, or a single-device view of the same layout):
        ``x``/``x_0`` are the LOCAL node slice, the primary edge args the
        LOCAL-src block (source AND destination ids inside the slice, so its
        gathers and per-edge matmuls touch only ``x`` and overlap the
        boundary ``all_to_all``), and ``halo = (src_h, dst_h, attr_h,
        mask_h, table_h)`` the HALO-src block, whose sources index
        ``table_h`` = [local nodes | received halo rows]. The segment
        softmax normalises across BOTH blocks (the exact union semantics of
        the unsharded layer)."""
        num_nodes = x.shape[0]
        dst_l = edge_dst
        cat_dim = 2 * self.in_channels + self.nbr_channels
        hidden = int(cat_dim / 1.5)
        mh_a = MultiHeadNetwork(
            cat_dim, self.out_channels if self.vector_attention else 1,
            hidden, self.heads, dtype=self.dtype, name="MH_A")
        mh_m = MultiHeadNetwork(cat_dim, self.out_channels, hidden,
                                self.heads, dtype=self.dtype, name="MH_M")
        if self.split_projection and halo is None:
            parts = [(x, edge_dst), (edge_attr, None), (x, edge_src)]
            alpha = mh_a(split_parts=parts)
            m = mh_m(split_parts=parts)
        else:
            # gather_rows = plain x[idx] forward; its BACKWARD runs as a
            # sorted CSR segment sum on the MXU instead of an XLA
            # scatter-add (~65 us -> ~15 us per scatter, ops/gather.py);
            # dst is sorted by the batch invariant, src via the collate's
            # stable argsort permutation (per-shard under edge sharding).
            # ``gather_plans`` shares the CSR searchsorted across the
            # model's layers (CGAtNet builds them once per step)
            blocked = halo is None or self.halo_blocked
            dst_plan, src_plan, *rest = (
                list(gather_plans) + [None] if gather_plans
                else [None, None, None])
            halo_dst_plan = rest[0] if rest else None
            m_cat = jnp.concatenate(
                [gather_rows(x, edge_dst, ids_sorted=blocked,
                             plan=dst_plan),
                 edge_attr,
                 gather_rows(x, edge_src,
                             perm=src_perm if blocked else None,
                             plan=src_plan)],
                axis=-1)
            # fused 2D fast path: MH nets and the segment softmax-aggregate
            # exchange (E, H*F) head-major FLAT tensors (no (E, H, hid) /
            # (E, H, F) relayouts in either direction), and the head mean
            # is static lane-slice adds on the small node-sized result.
            # Engages both plain (halo is None) and inside a shard_map cell
            # (halo_blocked): each cell's LOCAL block satisfies the kernel
            # invariants, so the edge-sharded step runs the same production
            # kernels per chip as the single-chip step (VERDICT r4 ask 1);
            # only the small halo block stays on the einsum path and the
            # union softmax merges the blocks flash-style (pair_flat).
            from ..ops import attention as _att
            from ..ops.pallas.mh_network import _block_rows
            from ..ops.pallas.mh_network import supported as _mh_ok
            from ..ops.pallas.segment_attention import (
                edge_softmax_aggregate_flat, edge_softmax_aggregate_pair_flat)
            cdt = self.dtype or jnp.float32
            use_flat = (blocked
                        and not (self.dropout > 0.0 and not deterministic)
                        and not self.final
                        and _att.get_backend() == "pallas"
                        and self.vector_attention
                        and _mh_ok(cat_dim, hidden, self.out_channels,
                                   self.heads, cdt)
                        and _block_rows(m_cat.shape[0]) is not None)
            alpha = m = None
            if use_flat:
                alpha2 = mh_a(m_cat, flat=True)
                m2 = mh_m(m_cat, flat=True)
                if alpha2.ndim == 3:
                    # blocks.py fell back to the einsum path (kernel-
                    # ineligible despite the gate, e.g. dims drifted):
                    # degrade to the rank-3 dataflow instead of crashing
                    alpha, m, use_flat = alpha2, m2, False
            if use_flat:
                c_ = self.out_channels
                if halo is None:
                    aggr2 = edge_softmax_aggregate_flat(
                        alpha2, m2, dst_l, num_nodes,
                        edge_mask=edge_mask, offn=dst_offn)  # (N, H*F)
                else:
                    src_h, dst_h, attr_h, mask_h, table_h = halo
                    m_cat_h = jnp.concatenate(
                        [gather_rows(x, dst_h, ids_sorted=True,
                                     plan=halo_dst_plan),
                         attr_h, table_h[src_h]], axis=-1)
                    e_h = m_cat_h.shape[0]
                    alpha_h = mh_a(m_cat_h)               # (Eh, H, F) einsum
                    m_h = mh_m(m_cat_h)
                    aggr2 = edge_softmax_aggregate_pair_flat(
                        alpha2, m2, dst_l, edge_mask,
                        alpha_h.reshape(e_h, -1), m_h.reshape(e_h, -1),
                        dst_h, mask_h, num_nodes,
                        offn_l=dst_offn, offn_h=halo_dst_offn)  # (N, H*F)
                aggr = sum(aggr2[:, k * c_:(k + 1) * c_].astype(jnp.float32)
                           for k in range(self.heads)) / self.heads
                aggr = aggr.astype(aggr2.dtype)
                if self.first:
                    return HNet0(c_, 3, c_, c_, 2, c_, c_, dtype=self.dtype,
                                 remat=self.hyper_remat,
                                 name="Pooling_NN")(x, aggr)
                return HNet(c_, 3, c_, c_, 2, c_, c_, dtype=self.dtype,
                            remat=self.hyper_remat,
                            name="Pooling_NN")(x_0, x, aggr)
            if alpha is None:
                alpha = mh_a(m_cat)
                m = mh_m(m_cat)
        if halo is not None:
            src_h, dst_h, attr_h, mask_h, table_h = halo
            m_cat_h = jnp.concatenate([x[dst_h], attr_h,
                                       table_h[src_h]], axis=-1)
            alpha_h = mh_a(m_cat_h)
            m_h = mh_m(m_cat_h)
            if self.dropout > 0.0 and not deterministic:
                w, w_h = segment_softmax_pair(alpha, dst_l, edge_mask,
                                              alpha_h, dst_h, mask_h,
                                              num_nodes)
                drop = nn.Dropout(self.dropout, deterministic=False)
                w, w_h = drop(w), drop(w_h)
                aggr = (segment_sum(
                            jnp.where(edge_mask[:, None, None], w * m, 0.0),
                            dst_l, num_nodes)
                        + segment_sum(
                            jnp.where(mask_h[:, None, None], w_h * m_h, 0.0),
                            dst_h, num_nodes))
            else:
                aggr = edge_softmax_aggregate_pair(
                    alpha, m, dst_l, edge_mask, alpha_h, m_h, dst_h, mask_h,
                    num_nodes, offn_l=dst_offn, offn_h=halo_dst_offn,
                    backend=self.pair_backend)
        elif self.dropout > 0.0 and not deterministic:
            w = segment_softmax(alpha, dst_l, num_nodes, mask=edge_mask)
            w = nn.Dropout(self.dropout, deterministic=False)(w)
            weighted = jnp.where(edge_mask[:, None, None], w * m, 0.0)
            aggr = segment_sum(weighted, dst_l, num_nodes)
        else:
            aggr = edge_softmax_aggregate(alpha, m, dst_l, num_nodes,
                                          edge_mask=edge_mask, offn=dst_offn)
        aggr = aggr.mean(axis=1)                    # (N, out)  CGAT.py:329
        if self.final:
            return aggr
        c = self.out_channels
        if self.first:
            return HNet0(c, 3, c, c, 2, c, c, dtype=self.dtype,
                         remat=self.hyper_remat, name="Pooling_NN")(x, aggr)
        return HNet(c, 3, c, c, 2, c, c, dtype=self.dtype,
                    remat=self.hyper_remat, name="Pooling_NN")(x_0, x, aggr)


class GATConvEdges(nn.Module):
    """Edge embedding update (CGAT.py:115-230).

    Default ``no_hyper=True``: the update is ``SimpleNetwork(edge_attr)`` and
    the head-normalised attention branch is dead (CGAT.py:224-225) — its
    parameters are still created so checkpoints line up, but the computation is
    skipped. With ``no_hyper=False`` the live attention aggregate conditions a
    hypernetwork (H_Net_0 / H_Net).
    """
    in_channels: int
    out_channels: int
    nbr_channels: int
    heads: int = 1
    vector_attention: bool = False
    first: bool = False
    no_hyper: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype | None = None
    hyper_remat: bool = False

    @nn.compact
    def __call__(self, x, edge_src, edge_dst, edge_attr, edge_attr_0,
                 edge_mask, *, deterministic=True, x_src_table=None):
        cat_dim = 2 * self.in_channels + self.nbr_channels
        hidden = int(cat_dim / 1.5)
        mh_a = MultiHeadNetwork(
            cat_dim, self.out_channels if self.vector_attention else 1,
            hidden, self.heads, dtype=self.dtype, name="MH_A")
        mh_m = MultiHeadNetwork(cat_dim, self.out_channels, hidden, self.heads,
                                dtype=self.dtype, name="MH_M")
        if self.no_hyper:
            # register dead-branch params without computing (CGAT.py:224-225)
            _ = mh_a(jnp.zeros((1, cat_dim), edge_attr.dtype))
            _ = mh_m(jnp.zeros((1, cat_dim), edge_attr.dtype))
            from .blocks import SimpleNetwork
            return SimpleNetwork(self.out_channels, [self.out_channels],
                                 dtype=self.dtype, name="Pooling_NN")(edge_attr)

        # live hypernetwork path: note concat order [x_src, e, x_dst]
        # (plain indexing, CGAT.py:209-211 — opposite of GATConvNodes)
        src_table = x if x_src_table is None else x_src_table
        m_cat = jnp.concatenate([src_table[edge_src], edge_attr,
                                 x[edge_dst]], axis=-1)
        alpha = jnp.exp(mh_a(m_cat))
        alpha = alpha / alpha.sum(axis=1, keepdims=True)   # across heads
        if self.dropout > 0.0 and not deterministic:
            alpha = nn.Dropout(self.dropout, deterministic=False)(alpha)
        m = mh_m(m_cat)
        aggr = (m.reshape(-1, self.heads, self.out_channels) * alpha).mean(axis=1)
        c = self.out_channels
        if self.first:
            return HNet0(c, 3, c, c, 2, c, c, dtype=self.dtype,
                         remat=self.hyper_remat,
                         name="Pooling_NN")(edge_attr, aggr)
        return HNet(c, 3, c, c, 2, c, c, dtype=self.dtype,
                    remat=self.hyper_remat,
                    name="Pooling_NN")(edge_attr_0, edge_attr, aggr)


class MHAttention(nn.Module):
    """Global crystal pooling (CGAT.py:14-62): per-atom gate from
    ``[atom_fea || roost_crys_fea[graph]]``, segment softmax over the atoms of
    each crystal, heads concatenated to (C, heads*out)."""
    in_channels: int
    out_channels: int
    heads: int = 1
    vector_attention: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, fea, cry_fea, node2graph, node_mask, num_graphs,
                 *, axis_name=None, offn=None, gplan=None):
        """``axis_name``: mesh axis the atoms are sharded over (edge
        partitioning). Each cell pools only its LOCAL atoms; the per-crystal
        softmax is completed with small (C, H, F) collectives — max via
        all_gather+max (differentiable), numerator/denominator via psum —
        instead of all-gathering the (N, F) node features and replicating
        the pooling work on every cell. ``offn``/``gplan``: host-precomputed
        CSR pointers over ``node2graph`` and the matching gather plan
        (single-device path only)."""
        m = MultiHeadNetwork(self.in_channels, self.out_channels,
                             self.in_channels, self.heads, dtype=self.dtype,
                             name="MH_M")(fea)
        cat = jnp.concatenate(
            [fea, gather_rows(cry_fea, node2graph, ids_sorted=True,
                              plan=gplan if axis_name is None else None)],
            axis=-1)
        alpha = MultiHeadNetwork(
            2 * self.in_channels,
            self.out_channels if self.vector_attention else 1,
            self.in_channels, self.heads, dtype=self.dtype, name="MH_A")(cat)
        m = jnp.broadcast_to(m, (m.shape[0], self.heads, self.out_channels))
        if axis_name is None:
            # same fused segment-softmax-aggregate as message passing (atoms
            # -> crystals instead of edges -> nodes); node2graph is sorted
            agg = edge_softmax_aggregate(alpha, m, node2graph, num_graphs,
                                         edge_mask=node_mask, offn=offn)
            return agg.reshape(-1, self.heads * self.out_channels)
        from ..ops.segment import NEG_BIG, SOFTMAX_EPS, segment_max
        masked = jnp.where(node_mask[:, None, None], alpha, NEG_BIG)
        local_max = jnp.maximum(
            segment_max(masked, node2graph, num_graphs), NEG_BIG)
        gmax = jnp.max(jax.lax.all_gather(local_max, axis_name), axis=0)
        ex = jnp.exp(alpha - gmax[node2graph])
        ex = jnp.where(node_mask[:, None, None], ex, 0.0)
        num = segment_sum(ex * m, node2graph, num_graphs)
        den = segment_sum(ex, node2graph, num_graphs)
        num, den = jax.lax.psum((num, den), axis_name)
        agg = num / (den + SOFTMAX_EPS)
        return agg.reshape(-1, self.heads * self.out_channels)


class CGAtNet(nn.Module):
    """Full model (CGAT.py:343-613). ``__call__(batch)`` -> (C, 2)."""
    config: CGATConfig

    @nn.compact
    def __call__(self, batch: CrystalBatch, *, last_layer: bool = True,
                 return_graph_embedding: bool = False,
                 deterministic: bool = True, edge_axis: str | None = None):
        """``edge_axis``: name of a mesh axis this call runs under (inside
        ``shard_map``) with the batch edge-partitioned: node/edge arrays are
        the local shard (collated with ``edge_shards``), composition/target
        arrays replicated. At each layer boundary only the BOUNDARY node
        features (sources referenced by another shard's edges) are exchanged
        via a static-shape ``all_to_all`` over ICI — comm per layer is
        O(S*halo*F), proportional to the partition boundary, not O(N*F).
        The collate layout splits each shard's edges into a LOCAL-src block
        and a HALO-src block: the local block's gathers and per-edge matmuls
        (the layer's dominant compute) read only the local node slice and
        carry NO data dependence on the collective, so XLA overlaps the
        exchange with them; only the small halo block consumes the received
        rows. Structural independence is asserted in
        tests/test_parallel.py::test_halo_overlap_independence. All per-edge
        tensors and per-node hypernetwork weights stay local — the GNN
        analogue of sequence parallelism (SURVEY.md section 5.7)."""
        cfg = self.config
        dt = cfg.dtype
        halo_mode = batch.halo_dst is not None
        if edge_axis is not None:
            assert halo_mode, \
                "edge_axis requires an edge-sharded collate (edge_shards>1)"
            n_loc = batch.nodes.shape[0]
            offset = jax.lax.axis_index(edge_axis) * n_loc
            dst_idx = batch.edge_dst - offset
            src_idx = batch.edge_src - offset      # local block: all local
            dst_h = batch.halo_dst - offset
            src_h = batch.halo_src_ext             # into [local | halo rows]
            pair_backend = None                    # module default (pallas ok)

            def src_table(x):
                """[local nodes | halo rows]: exchange boundary features."""
                payload = x[batch.halo_send_idx]       # (S, halo, F)
                recv = jax.lax.all_to_all(payload, edge_axis, 0, 0)
                return jnp.concatenate(
                    [x, recv.reshape(-1, x.shape[-1])], axis=0)
        elif halo_mode:
            # single-device consumption of an edge-sharded layout (tests /
            # oracles): same block-pair dataflow, the "exchange" is identity.
            # Padding interleaves between shard blocks here (not a global
            # False-suffix), so the pair aggregation must take the XLA path.
            dst_idx, src_idx = batch.edge_dst, batch.edge_src
            dst_h, src_h = batch.halo_dst, batch.halo_src
            pair_backend = "xla"
            src_table = lambda x: x
        else:
            dst_idx = batch.edge_dst
            src_idx = batch.edge_src
            pair_backend = None
            src_table = lambda x: None

        # one CSR plan set for all layers' gather backwards (the
        # searchsorted is a device while-loop XLA does not CSE; 5 layers x
        # 2 gathers re-ran it 10x — round-4 trace)
        gather_plans = None
        pool_plan = None
        from ..ops import attention as _att_backend
        if (_att_backend.get_backend() == "pallas"
                and batch.edge_src_perm is not None):
            from ..ops.gather import GatherPlan
            n_slots = batch.nodes.shape[0]
            if not halo_mode:
                # single-shard collates additionally ship host-precomputed
                # sorted src ids + unclamped CSR pointers, so no per-step
                # device argsort-gather or searchsorted remains
                gather_plans = (
                    GatherPlan.build(batch.edge_dst, n_slots,
                                     offn=batch.edge_dst_offn),
                    GatherPlan.build(batch.edge_src, n_slots,
                                     perm=batch.edge_src_perm,
                                     sidx=batch.edge_src_sorted,
                                     offn=batch.edge_src_offn))
                if edge_axis is None:
                    pool_plan = GatherPlan.build(
                        batch.node2graph, batch.num_graphs,
                        offn=batch.node2graph_offn)
            elif edge_axis is not None:
                # inside a shard_map cell: LOCAL indices against the local
                # node slice; the edge-sharded collate's per-shard perm /
                # sorted src / CSR pointers carry block-local values
                # (data/batching.py), so each cell consumes exactly its
                # `edge`-axis slice of them. Third plan: the halo block's
                # (sorted) destination gather.
                gather_plans = (
                    GatherPlan.build(dst_idx, n_slots,
                                     offn=batch.edge_dst_offn),
                    GatherPlan.build(src_idx, n_slots,
                                     perm=batch.edge_src_perm,
                                     sidx=batch.edge_src_sorted,
                                     offn=batch.edge_src_offn),
                    GatherPlan.build(dst_h, n_slots,
                                     offn=batch.halo_dst_offn))

        from .blocks import MatmulEmbed
        nbr_embed = MatmulEmbed(cfg.neighbor_number + 1,
                                cfg.nbr_embedding_size,
                                embedding_init=nn.initializers.normal(1.0),
                                name="nbr_embedding")
        edge_attr = jnp.asarray(nbr_embed(batch.edge_shell), dt)
        elem_fea = TorchLinear(cfg.elem_fea_len, use_bias=False, dtype=dt,
                               name="embedding")(jnp.asarray(batch.nodes, dt))
        elem_fea_0 = elem_fea
        edge_attr_0 = edge_attr
        if halo_mode:
            edge_attr_h = jnp.asarray(nbr_embed(batch.halo_shell), dt)
            edge_attr_h_0 = edge_attr_h

        # rematerialise MP layers in the backward pass: the per-node
        # hypernetwork weight tensors (N, out, in) dominate activation memory
        node_cls = nn.remat(GATConvNodes) if cfg.remat else GATConvNodes
        edge_cls = nn.remat(GATConvEdges) if cfg.remat else GATConvEdges

        def node_layer(i):
            return node_cls(cfg.elem_fea_len, cfg.elem_fea_len,
                            cfg.nbr_embedding_size, cfg.msg_heads,
                            vector_attention=cfg.vector_attention,
                            first=(i == 0), dropout=cfg.dropout, dtype=dt,
                            hyper_remat=cfg.hyper_remat,
                            split_projection=cfg.split_projection,
                            pair_backend=pair_backend,
                            halo_blocked=edge_axis is not None,
                            name=f"graph_{i}_Node")

        def edge_layer(i):
            return edge_cls(cfg.elem_fea_len, cfg.nbr_embedding_size,
                            cfg.nbr_embedding_size, cfg.msg_heads,
                            vector_attention=cfg.vector_attention,
                            first=(i == 0), no_hyper=cfg.no_hyper,
                            dropout=cfg.dropout, dtype=dt,
                            hyper_remat=cfg.hyper_remat,
                            name=f"graph_{i}_Edge")

        for i in range(cfg.n_graph):
            if halo_mode:
                table = src_table(elem_fea)   # issues the all_to_all (or id)
                halo_n = (src_h, dst_h, edge_attr_h, batch.halo_mask, table)
            else:
                table = halo_n = None
            node_update = node_layer(i)(
                elem_fea, src_idx, dst_idx, edge_attr,
                elem_fea_0, batch.edge_mask, deterministic=deterministic,
                halo=halo_n, src_perm=batch.edge_src_perm,
                gather_plans=gather_plans,
                # per-cell block-local pointers under shard_map; the
                # single-device consumption of a sharded layout (edge_axis
                # None but halo_mode) has no usable offsets
                dst_offn=(batch.edge_dst_offn
                          if not halo_mode or edge_axis is not None
                          else None),
                halo_dst_offn=(batch.halo_dst_offn
                               if edge_axis is not None else None))
            if cfg.update_edges:
                el = edge_layer(i)
                edge_attr = edge_attr + el(
                    elem_fea, src_idx, dst_idx, edge_attr,
                    edge_attr_0, batch.edge_mask,
                    deterministic=deterministic)
                if halo_mode:
                    edge_attr_h = edge_attr_h + el(
                        elem_fea, src_h, dst_h, edge_attr_h,
                        edge_attr_h_0, batch.halo_mask,
                        deterministic=deterministic, x_src_table=table)
            # else: the reference's update_edges=False branch passes
            # positionally broken args (CGAT.py:406-425, dead under
            # defaults); we build the sane equivalent: node-only stack.
            elem_fea = elem_fea + node_update

        # composition/output head run replicated (tiny (C, ...) work; the
        # trainer divides the loss by the edge axis size so psum'd gradients
        # stay exact); the atom pooling itself is sharded — each edge cell
        # pools its LOCAL atoms and MHAttention completes the per-crystal
        # softmax with (C, H, F)-sized collectives, so node features are
        # never all-gathered.
        crys_fea = Roost(cfg.orig_elem_fea_len, cfg.elem_fea_len,
                         cfg.n_graph_roost, dtype=dt, name="roost")(
            batch.comp_weight, jnp.asarray(batch.comp_fea, dt), batch.comp_mask)
        crys_fea = MHAttention(cfg.elem_fea_len, cfg.elem_fea_len,
                               heads=cfg.msg_heads,
                               vector_attention=cfg.global_vector_attention,
                               dtype=dt, name="cry_pool")(
            elem_fea, crys_fea, batch.node2graph, batch.node_mask,
            batch.num_graphs, axis_name=edge_axis,
            offn=None if halo_mode else batch.node2graph_offn,
            gplan=pool_plan)

        if cfg.mean_pooling:
            crys_fea = crys_fea.reshape(-1, cfg.msg_heads,
                                        cfg.elem_fea_len).mean(axis=1)
        if return_graph_embedding:
            return crys_fea
        out = ResidualNetwork(2, list(cfg.out_hidden), if_rezero=cfg.rezero,
                              dtype=dt, name="output_nn")(
            crys_fea, last_layer=last_layer)
        return jnp.asarray(out, jnp.float32)
