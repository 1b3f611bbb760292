from .batching import CrystalBatch, CrystalGraph, collate, pad_to_bucket

__all__ = ["CrystalBatch", "CrystalGraph", "collate", "pad_to_bucket"]
