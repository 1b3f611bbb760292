"""Independent PyTorch oracle of the reference CGAT semantics.

Implements the reference model's math (hyllios/CGAT: CGAT/CGAT.py,
roost_message.py, Hypernetworksmp.py, message_changed.py) directly from spec
with plain torch ops over *unpadded* edge lists — loops for segment reductions,
explicit per-head linears for the grouped-conv MultiHeadNetwork — and consumes
the flax parameter tree of ``cgat_tpu`` so the two implementations can be
compared activation-for-activation. Test-only code; deliberately slow and
obvious.
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def t(x):
    if torch.is_tensor(x):
        return x  # pass through live (possibly requires_grad) tensors
    return torch.as_tensor(np.asarray(x), dtype=torch.float32)


def ti(x):
    if torch.is_tensor(x):
        return x.long()
    return torch.as_tensor(np.asarray(x), dtype=torch.long)


def torch_params(params, requires_grad=False):
    """Flax param tree (numpy/jax leaves) -> same tree of torch tensors.

    With ``requires_grad=True`` the leaves are optimizer-ready: drive the
    oracle with torch autograd for training-trajectory comparisons."""
    if isinstance(params, dict):
        return {k: torch_params(v, requires_grad) for k, v in params.items()}
    leaf = torch.tensor(np.asarray(params), dtype=torch.float32)
    if requires_grad:
        leaf.requires_grad_(True)
    return leaf


def param_leaves(params):
    out = []
    if isinstance(params, dict):
        for k in sorted(params):
            out.extend(param_leaves(params[k]))
    else:
        out.append(params)
    return out


# ---------------------------------------------------------------- blocks


def linear(p, x):
    y = x @ t(p["kernel"])
    if "bias" in p:
        y = y + t(p["bias"])
    return y


def simple_network(p, x):
    i = 0
    while f"fc_{i}" in p:
        x = F.leaky_relu(linear(p[f"fc_{i}"], x), 0.01)
        i += 1
    return linear(p["fc_out"], x)


def residual_network(p, x, last_layer=True):
    i = 0
    while f"fc_{i}" in p:
        branch = torch.relu(linear(p[f"fc_{i}"], x))
        if f"rezero_{i}" in p:
            branch = t(p[f"rezero_{i}"]["alpha"]) * branch
        skip = x @ t(p[f"res_fc_{i}"]["kernel"]) if f"res_fc_{i}" in p else x
        x = branch + skip
        i += 1
    return linear(p["fc_out"], x) if last_layer else x


def multi_head_network(p, x):
    """Per-head explicit linears (grouped Conv1d semantics, CGAT.py:91-109)."""
    x = x.reshape(x.shape[0], -1)
    w_in, b_in = t(p["fc_in_kernel"]), t(p["fc_in_bias"])
    w_out, b_out = t(p["fc_out_kernel"]), t(p["fc_out_bias"])
    outs = []
    for h in range(w_in.shape[0]):
        hid = F.leaky_relu(x @ w_in[h].T + b_in[h], 0.01)
        outs.append(hid @ w_out[h].T + b_out[h])
    return torch.stack(outs, dim=1)  # (B, H, out)


# ------------------------------------------------------- segment reductions


def segment_softmax(scores, index, num_segments):
    """torch_geometric.utils.softmax semantics (max-shifted, +1e-16)."""
    out = torch.zeros_like(scores)
    for s in range(num_segments):
        m = index == s
        if m.any():
            sub = scores[m]
            sub = (sub - sub.max(dim=0, keepdim=True).values).exp()
            out[m] = sub / (sub.sum(dim=0, keepdim=True) + 1e-16)
    return out


def scatter_add(src, index, num_segments):
    out = torch.zeros((num_segments,) + tuple(src.shape[1:]), dtype=src.dtype)
    out.index_add_(0, index, src)
    return out


def scatter_max(src, index, num_segments):
    out = torch.zeros((num_segments,) + tuple(src.shape[1:]), dtype=src.dtype)
    for s in range(num_segments):
        m = index == s
        if m.any():
            out[s] = src[m].max(dim=0).values
    return out


# ------------------------------------------------------------ hypernetworks


def fc_block(p, x):
    i = 0
    while f"fc_{i}_kernel" in p:
        x = torch.tanh(x @ t(p[f"fc_{i}_kernel"]) + t(p[f"fc_{i}_bias"]))
        i += 1
    return x @ t(p["fc_last_kernel"]) + t(p["fc_last_bias"])


def hyper_linear(p, cond, x, in_ch, out_ch):
    """HyperLinear + BatchLinear (Hypernetworksmp.py:188-254), literal."""
    params = fc_block(p["hypo_params"], cond)
    w = params[..., : in_ch * out_ch].reshape(-1, out_ch, in_ch)
    b = params[..., in_ch * out_ch:].reshape(-1, 1, out_ch)
    y = x.view(x.shape[0], 1, in_ch).matmul(w.permute(0, 2, 1)) + b
    return y.view(x.shape[0], out_ch)


def hyper_fc(p, cond, x, hidden_ch, out_ch):
    i = 0
    while f"layer_{i}" in p:
        x = hyper_linear(p[f"layer_{i}"], cond, x, x.shape[-1], hidden_ch)
        x = F.layer_norm(x, (hidden_ch,))
        x = torch.tanh(x)
        i += 1
    return hyper_linear(p["layer_last"], cond, x, hidden_ch, out_ch)


def h_net_0(p, h0, x, out_ch):
    return hyper_fc(p["Hyper"], h0, x, out_ch, out_ch)


def h_net(p, h0, h_t, x, out_ch):
    d = p["damping"]
    if torch.is_tensor(d):
        # reference semantics: damping.data clamped IN PLACE each forward
        # (projected gradient; Hypernetworksmp.py:309-313) — the autograd
        # graph sees the clamped value with unit gradient
        with torch.no_grad():
            d.clamp_(0.0, 1.0)
        d = d.reshape(())
    else:
        d = float(np.clip(np.asarray(d).reshape(-1), 0.0, 1.0)[0])
    cond = d * h0 + (1.0 - d) * x
    return hyper_fc(p["Hyper"], cond, x, out_ch, out_ch)


# ------------------------------------------------------------- conv layers


def gat_conv_nodes(p, x, src, dst, edge_attr, x_0, out_ch, first):
    """CGAT.py:233-335 with PyG source_to_target flow: x_i = x[dst]."""
    m_cat = torch.cat([x[dst], edge_attr, x[src]], dim=-1)
    alpha = multi_head_network(p["MH_A"], m_cat)
    m = multi_head_network(p["MH_M"], m_cat)
    alpha = segment_softmax(alpha, dst, x.shape[0])
    aggr = scatter_add(m * alpha, dst, x.shape[0]).mean(dim=1)
    if first:
        return h_net_0(p["Pooling_NN"], x, aggr, out_ch)
    return h_net(p["Pooling_NN"], x_0, x, aggr, out_ch)


def gat_conv_edges(p, x, src, dst, edge_attr, edge_attr_0, out_ch,
                   first, no_hyper, vector_attention):
    """CGAT.py:115-230; default no_hyper=True -> Pooling_NN(edge_attr) only."""
    if no_hyper:
        return simple_network(p["Pooling_NN"], edge_attr)
    m_cat = torch.cat([x[src], edge_attr, x[dst]], dim=-1)
    alpha = multi_head_network(p["MH_A"], m_cat).exp()
    if not vector_attention:
        alpha = alpha / alpha.sum(dim=1).view(-1, 1, 1)
    else:
        alpha = alpha / alpha.sum(dim=1).view(-1, 1, out_ch)
    m = multi_head_network(p["MH_M"], m_cat)
    aggr = (m.view(-1, alpha.shape[1], out_ch) * alpha).mean(dim=1)
    if first:
        return h_net_0(p["Pooling_NN"], edge_attr, aggr, out_ch)
    return h_net(p["Pooling_NN"], edge_attr_0, edge_attr, aggr, out_ch)


def mh_attention(p, fea, cry_fea, index, heads, out_ch):
    """Global pool, CGAT.py:14-62."""
    size = int(index.max().item()) + 1
    m = multi_head_network(p["MH_M"], fea)
    cat = torch.stack([fea, cry_fea[index]]).transpose(1, 0)  # (N,2,F)
    alpha = multi_head_network(p["MH_A"], cat)
    alpha = segment_softmax(alpha, index, size)
    return scatter_add((alpha * m).reshape(-1, heads * out_ch), index, size)


# -------------------------------------------------------------------- roost


def weighted_attention(gate_p, pow_, fea, index, weights, num_segments,
                       message_p=None):
    """roost_message.py:286-317; message_p=None means Identity message."""
    gate = simple_network(gate_p, fea)
    gate = gate - scatter_max(gate, index, num_segments)[index]
    # pow is a learnable scalar (roost_message.py:300) — keep it in-graph
    pw = pow_.reshape(()) if torch.is_tensor(pow_) else torch.as_tensor(
        float(np.asarray(pow_).reshape(-1)[0]))
    gate = (weights ** pw) * gate.exp()
    gate = gate / (scatter_add(gate, index, num_segments)[index] + 1e-13)
    msg = simple_network(message_p, fea) if message_p is not None else fea
    return scatter_add(gate * msg, index, num_segments)


def roost_forward(p, elem_weights, orig_fea, self_idx, nbr_idx, cry_idx):
    """roost_message.py:212-264 on concatenated composition edge lists.

    elem_weights: (N,1); orig_fea: (N, orig); self/nbr_idx: (M,);
    cry_idx: (N,). Returns (C, fea_len).
    """
    n = orig_fea.shape[0]
    fea = linear(p["embedding"], orig_fea)
    fea = torch.cat([fea, elem_weights], dim=1)
    i = 0
    while f"graph_{i}" in p:
        g = p[f"graph_{i}"]
        pair = torch.cat([fea[self_idx], fea[nbr_idx]], dim=1)
        head = weighted_attention(g["head0_gate_nn"], g["head0_pow"], pair,
                                  self_idx, elem_weights[nbr_idx], n,
                                  message_p=g["head0_message_nn"])
        fea = head + fea
        i += 1
    size = int(cry_idx.max().item()) + 1
    return weighted_attention(p["cry_pool0_gate_nn"], p["cry_pool0_pow"], fea,
                              cry_idx, elem_weights, size)


# --------------------------------------------------------------- full model


def cgat_forward(params, cfg, g, *, last_layer=True,
                 return_graph_embedding=False):
    """Reference CGAtNet.forward (CGAT.py:540-600) on an unpadded batch.

    ``g`` is a dict of numpy arrays: nodes (N,orig), edge_src/dst/shell (E,),
    node2graph (N,), and concatenated roost arrays comp_weights (Nc,1),
    comp_fea (Nc,orig), comp_self_idx/comp_nbr_idx (Mc,), comp_cry_idx (Nc,).
    """
    x = t(g["nodes"]) @ t(params["embedding"]["kernel"])
    emb = t(params["nbr_embedding"]["embedding"])
    e = emb[ti(g["edge_shell"])]
    src, dst = ti(g["edge_src"]), ti(g["edge_dst"])
    x_0, e_0 = x.clone(), e.clone()
    fl = cfg.elem_fea_len
    i = 0
    while f"graph_{i}_Node" in params:
        node_update = gat_conv_nodes(params[f"graph_{i}_Node"], x, src, dst,
                                     e, x_0, fl, first=(i == 0))
        if f"graph_{i}_Edge" in params:
            e = e + gat_conv_edges(params[f"graph_{i}_Edge"], x, src, dst, e,
                                   e_0, cfg.nbr_embedding_size,
                                   first=(i == 0), no_hyper=cfg.no_hyper,
                                   vector_attention=cfg.vector_attention)
        x = x + node_update
        i += 1

    crys = roost_forward(params["roost"], t(g["comp_weights"]),
                         t(g["comp_fea"]), ti(g["comp_self_idx"]),
                         ti(g["comp_nbr_idx"]), ti(g["comp_cry_idx"]))
    crys = mh_attention(params["cry_pool"], x, crys, ti(g["node2graph"]),
                        cfg.msg_heads, fl)
    if cfg.mean_pooling:
        crys = crys.view(-1, cfg.msg_heads, fl).mean(dim=1)
    if return_graph_embedding:
        return crys
    return residual_network(params["output_nn"], crys, last_layer=last_layer)
