"""Pure-torch shims of the native deps the reference source imports.

The reference at /root/reference uses `torch_scatter`, `torch_geometric`,
`torchvision` (import-only) and `pytorch_lightning` — none installed here.
The subset it actually touches is small (SURVEY.md section 2.3):
``scatter_add/max/mean`` (CGAT.py:6, roost_message.py:27),
``softmax(alpha, index)`` (CGAT.py:9), ``MessagePassing`` with
``aggr='add'``/``node_dim=0``/``propagate`` (CGAT.py:275-276, 313-317),
``Data``/``Batch.from_data_list`` (data.py:1, lightning_module.py:21), and
the ``LightningModule`` base class (lightning_module.py:24). This module
implements exactly that surface in plain torch and installs the fakes into
``sys.modules`` so the ACTUAL reference source can be imported and executed
on CPU — making parity tests independent of any builder-written oracle.

Everything here is test-support code written from the public API contracts;
nothing is copied from the reference.
"""
from __future__ import annotations

import inspect
import sys
import types

import torch


# --------------------------------------------------------------- torch_scatter

def _expand_index(index: torch.Tensor, src: torch.Tensor, dim: int):
    """torch_scatter-style broadcast of a 1-D index along ``dim``."""
    if index.dim() == 1 and src.dim() > 1:
        shape = [1] * src.dim()
        shape[dim] = src.size(dim)
        index = index.view(shape).expand_as(src)
    return index


def _out_shape(src: torch.Tensor, index: torch.Tensor, dim: int, dim_size):
    if dim_size is None:
        dim_size = int(index.max().item()) + 1 if index.numel() else 0
    shape = list(src.shape)
    shape[dim] = dim_size
    return shape


def scatter_add(src, index, dim=-1, out=None, dim_size=None):
    if dim < 0:
        dim += src.dim()
    if out is None:
        out = torch.zeros(_out_shape(src, index, dim, dim_size),
                          dtype=src.dtype, device=src.device)
    if dim == 0 and index.dim() == 1:
        return out.index_add(0, index, src)
    return out.scatter_add(dim, _expand_index(index, src, dim), src)


def scatter_max(src, index, dim=-1, out=None, dim_size=None):
    """Returns (values, argmax). Empty segments keep the zero init (the
    reference only ever gathers results back through ``[index]``, so the
    fill value for untouched rows is never observed)."""
    if dim < 0:
        dim += src.dim()
    idx = _expand_index(index, src, dim)
    values = torch.zeros(_out_shape(src, index, dim, dim_size),
                         dtype=src.dtype, device=src.device)
    values = values.scatter_reduce(dim, idx, src, reduce="amax",
                                   include_self=False)
    hit = torch.gather(values, dim, idx) == src
    argmax = torch.full(values.shape, src.size(dim), dtype=torch.long,
                        device=src.device)
    pos = torch.arange(src.size(dim), device=src.device)
    pos = _expand_index(pos, src, dim) if src.dim() > 1 else pos
    argmax = argmax.scatter_reduce(
        dim, idx, torch.where(hit, pos, src.size(dim)), reduce="amin",
        include_self=True)
    return values, argmax


def scatter_mean(src, index, dim=-1, out=None, dim_size=None):
    if dim < 0:
        dim += src.dim()
    total = scatter_add(src, index, dim, None, dim_size)
    ones = torch.ones(src.size(dim), dtype=src.dtype, device=src.device)
    count = torch.zeros(total.size(dim), dtype=src.dtype, device=src.device)
    count = count.index_add(0, index.reshape(-1) if index.dim() == 1
                            else index, ones).clamp(min=1)
    shape = [1] * total.dim()
    shape[dim] = -1
    return total / count.view(shape)


# ----------------------------------------------------- torch_geometric.utils

def pyg_softmax(src, index, ptr=None, num_nodes=None):
    """Numerically-stable segment softmax (torch_geometric.utils.softmax
    public contract: max-shifted exp, denominator + 1e-16)."""
    n = int(num_nodes) if num_nodes is not None else (
        int(index.max().item()) + 1 if index.numel() else 0)
    src_max = scatter_max(src.detach(), index, dim=0, dim_size=n)[0]
    out = (src - src_max.index_select(0, index)).exp()
    denom = scatter_add(out, index, dim=0, dim_size=n).index_select(0, index)
    return out / (denom + 1e-16)


# -------------------------------------------------- torch_geometric.nn (MP)

class MessagePassing(torch.nn.Module):
    """Minimal ``propagate`` engine honoring the subset the reference uses:
    ``flow='source_to_target'`` (i = edge_index[1] = target,
    j = edge_index[0] = source), ``aggr='add'``, ``node_dim`` as the gather/
    scatter axis, ``_i``/``_j``-suffixed message args, ``edge_index_i``, and
    ``update(aggr_out, <propagate kwargs>)``."""

    def __init__(self, aggr="add", flow="source_to_target", node_dim=0,
                 **kwargs):
        super().__init__()
        assert aggr in ("add", "mean", "max")
        self.aggr = aggr
        self.flow = flow
        self.node_dim = node_dim

    def propagate(self, edge_index, size=None, **kwargs):
        if self.flow == "source_to_target":
            j_idx, i_idx = edge_index[0], edge_index[1]
        else:
            i_idx, j_idx = edge_index[0], edge_index[1]

        def lookup(name):
            if name == "edge_index_i":
                return i_idx
            if name == "edge_index_j":
                return j_idx
            if name.endswith("_i") or name.endswith("_j"):
                base, suffix = name[:-2], name[-1]
                val = kwargs[base]
                if isinstance(val, (tuple, list)):
                    val = val[0] if suffix == "j" else val[1]
                idx = j_idx if suffix == "j" else i_idx
                return val.index_select(self.node_dim, idx)
            return kwargs[name]

        msg_params = [p for p in
                      inspect.signature(self.message).parameters
                      if p != "self"]
        msg = self.message(**{p: lookup(p) for p in msg_params})

        # infer the aggregation size like PyG: from `size` if given, else
        # from the target-side tensor's node_dim extent
        if size is not None:
            dim_size = size[1] if isinstance(size, (tuple, list)) else size
        else:
            x = kwargs.get("x")
            if isinstance(x, (tuple, list)):
                x = x[1] if x[1] is not None else x[0]
            dim_size = x.size(self.node_dim)

        if self.aggr == "add":
            aggr_out = scatter_add(msg, i_idx, dim=self.node_dim,
                                   dim_size=dim_size)
        elif self.aggr == "mean":
            aggr_out = scatter_mean(msg, i_idx, dim=self.node_dim,
                                    dim_size=dim_size)
        else:
            aggr_out = scatter_max(msg, i_idx, dim=self.node_dim,
                                   dim_size=dim_size)[0]

        upd_params = [p for p in
                      inspect.signature(self.update).parameters
                      if p != "self"][1:]   # first is aggr_out
        return self.update(aggr_out, **{p: lookup(p) for p in upd_params})

    def message(self, x_j):          # pragma: no cover - always overridden
        return x_j

    def update(self, aggr_out):      # pragma: no cover - always overridden
        return aggr_out


# ------------------------------------------------- torch_geometric.data

class Data:
    """Attribute bag for one graph (x, edge_index, edge_attr, y, ...)."""

    def __init__(self, **kwargs):
        for k, v in kwargs.items():
            setattr(self, k, v)

    @property
    def num_nodes(self):
        return self.x.size(0)

    def to(self, device):
        return self


class Batch(Data):
    """Concatenation of Data graphs with node-index offsetting and a
    ``batch`` node->graph vector (PyG ``Batch.from_data_list`` contract)."""

    @classmethod
    def from_data_list(cls, data_list):
        xs, eis, eas, ys, batch_vec = [], [], [], [], []
        offset = 0
        for g, d in enumerate(data_list):
            n = d.x.size(0)
            xs.append(d.x)
            eis.append(d.edge_index + offset)
            if getattr(d, "edge_attr", None) is not None:
                eas.append(d.edge_attr)
            if getattr(d, "y", None) is not None:
                ys.append(d.y.reshape(-1))
            batch_vec.append(torch.full((n,), g, dtype=torch.long))
            offset += n
        out = cls(x=torch.cat(xs, dim=0),
                  edge_index=torch.cat(eis, dim=1),
                  batch=torch.cat(batch_vec))
        if eas:
            out.edge_attr = torch.cat(eas, dim=0)
        if ys:
            out.y = torch.cat(ys).view(-1, 1)
        out.num_graphs = len(data_list)
        return out


# ---------------------------------------------------------- lightning shim

class _HParams(dict):
    """Namespace/dict hybrid like Lightning's AttributeDict."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


class LightningModule(torch.nn.Module):
    """Just enough of the Lightning base class for the reference
    ``LightningModel`` to construct and run its steps manually: hparams
    storage, metric logging into a dict, a ``device`` property."""

    def __init__(self):
        super().__init__()
        self._hparams = _HParams()
        self.logged: dict = {}
        self.trainer = None

    def save_hyperparameters(self, hparams=None):
        if hparams is None:
            return
        if hasattr(hparams, "__dict__") and not isinstance(hparams, dict):
            hparams = vars(hparams)
        self._hparams.update(hparams)

    @property
    def hparams(self):
        return self._hparams

    def log(self, name, value, **kwargs):
        self.logged.setdefault(name, []).append(
            float(value.detach()) if torch.is_tensor(value) else float(value))

    @property
    def device(self):
        try:
            return next(self.parameters()).device
        except StopIteration:
            return torch.device("cpu")

    def print(self, *args, **kwargs):
        print(*args, **kwargs)


# ------------------------------------------------------------------ install

REFERENCE_ROOT = "/root/reference"


def _module(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install(reference_root: str = REFERENCE_ROOT) -> None:
    """Inject the shims into sys.modules and put the reference repo on
    sys.path so ``import CGAT.CGAT`` executes the real source."""
    if "torch_scatter" not in sys.modules:
        _module("torch_scatter", scatter_add=scatter_add,
                scatter_max=scatter_max, scatter_mean=scatter_mean)

    if "torch_geometric" not in sys.modules:
        tg = _module("torch_geometric")
        tg.nn = _module("torch_geometric.nn", MessagePassing=MessagePassing)
        tg.utils = _module("torch_geometric.utils", softmax=pyg_softmax)
        tg.data = _module("torch_geometric.data", Data=Data, Batch=Batch)

    if "torchvision" not in sys.modules:
        tv = _module("torchvision")
        tv.utils = _module("torchvision.utils")

    if "pytorch_lightning" not in sys.modules:
        pl = _module("pytorch_lightning", LightningModule=LightningModule)
        pl.core = _module("pytorch_lightning.core",
                          LightningModule=LightningModule)

    if reference_root not in sys.path:
        sys.path.insert(0, reference_root)


def import_reference():
    """Install the shims and import the real reference modules. Returns the
    ``CGAT`` package (reference source, executing under the shims)."""
    install()
    import CGAT.CGAT  # noqa: F401  (real /root/reference source)
    import CGAT.roost_message  # noqa: F401
    import CGAT.Hypernetworksmp  # noqa: F401
    import CGAT  # noqa: F401
    return sys.modules["CGAT"]
