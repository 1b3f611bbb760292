from .segment_attention import (edge_softmax_aggregate,
                                edge_softmax_aggregate_pair)

__all__ = ["edge_softmax_aggregate", "edge_softmax_aggregate_pair"]
