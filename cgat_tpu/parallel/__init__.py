from .distributed import (
    local_dp_rows,
    make_batch_sharder,
    maybe_initialize_distributed,
)
from .mesh import make_mesh
from .sharding import (
    batch_shardings,
    replicate,
    shard_stacked_batch,
    stack_batches,
)
from .trainer import (ParallelLoader, StreamingParallelLoader,
                      make_parallel_eval_step, make_parallel_train_step)

__all__ = [
    "make_mesh",
    "maybe_initialize_distributed",
    "local_dp_rows",
    "make_batch_sharder",
    "batch_shardings",
    "replicate",
    "shard_stacked_batch",
    "stack_batches",
    "ParallelLoader",
    "StreamingParallelLoader",
    "make_parallel_eval_step",
    "make_parallel_train_step",
]
