from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    batch_sharding,
    replicated,
    param_sharding_rule,
    shard_params,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "param_sharding_rule",
    "shard_params",
    "shard_batch",
]
