from .mesh import make_mesh, replicate, shard_batch
from .sharding import (
    model_parallel_rules,
    param_shardings,
    shard_batch_2d,
    shard_params,
    shard_train_state,
)

__all__ = [
    "make_mesh",
    "replicate",
    "shard_batch",
    "model_parallel_rules",
    "param_shardings",
    "shard_batch_2d",
    "shard_params",
    "shard_train_state",
]
