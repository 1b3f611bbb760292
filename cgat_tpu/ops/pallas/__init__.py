from .segment_attention import edge_softmax_aggregate

__all__ = ["edge_softmax_aggregate"]
