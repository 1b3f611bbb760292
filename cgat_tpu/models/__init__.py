from .blocks import (
    MultiHeadNetwork,
    ResidualNetwork,
    Rezero,
    SimpleNetwork,
    TorchLinear,
)
from .cgat import CGATConfig, CGAtNet, GATConvEdges, GATConvNodes, MHAttention
from .hyper import FCBlock, HNet, HNet0, HyperFC, HyperLinear
from .roost import MessageLayer, Roost

__all__ = [
    "CGATConfig",
    "CGAtNet",
    "GATConvEdges",
    "GATConvNodes",
    "MHAttention",
    "MultiHeadNetwork",
    "ResidualNetwork",
    "Rezero",
    "SimpleNetwork",
    "TorchLinear",
    "FCBlock",
    "HNet",
    "HNet0",
    "HyperFC",
    "HyperLinear",
    "MessageLayer",
    "Roost",
]
