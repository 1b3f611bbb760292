from . import segment
from .attention import edge_softmax_aggregate, headnorm_attention, set_backend, get_backend
from .segment import (
    segment_sum,
    segment_max,
    segment_mean,
    segment_softmax,
    weighted_segment_softmax,
)

__all__ = [
    "segment",
    "segment_sum",
    "segment_max",
    "segment_mean",
    "segment_softmax",
    "weighted_segment_softmax",
    "edge_softmax_aggregate",
    "headnorm_attention",
    "set_backend",
    "get_backend",
]
