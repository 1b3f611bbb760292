"""cgat_tpu: TPU-native crystal-graph attention framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of hyllios/CGAT
(crystal graph attention networks for materials property prediction):
static padded crystal-graph batches, fused segment-attention kernels, a
pjit/shard_map multi-chip trainer, Roost composition pooling, hypernetwork
message functions, GP uncertainty head, transfer learning and the
active-learning toolkit.
"""

__version__ = "0.1.0"

from . import data, models, ops

__all__ = ["data", "models", "ops", "__version__"]
