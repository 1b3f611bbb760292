from .batching import CrystalBatch, CrystalGraph, collate, pad_to_bucket
from .streaming import StreamingGraphLoader, scan_shard_metadata

__all__ = ["CrystalBatch", "CrystalGraph", "collate", "pad_to_bucket",
           "StreamingGraphLoader", "scan_shard_metadata"]
