from .mesh import make_mesh
from .sharding import (
    batch_shardings,
    replicate,
    shard_stacked_batch,
    stack_batches,
)
from .trainer import ParallelLoader, make_parallel_eval_step, make_parallel_train_step

__all__ = [
    "make_mesh",
    "batch_shardings",
    "replicate",
    "shard_stacked_batch",
    "stack_batches",
    "ParallelLoader",
    "make_parallel_eval_step",
    "make_parallel_train_step",
]
