from .mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    make_mesh,
    batch_sharding,
    replicated,
    param_sharding_rule,
    shard_params,
    shard_batch,
    pad_batch_rows,
)

__all__ = [
    "pad_batch_rows",
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "batch_sharding",
    "replicated",
    "param_sharding_rule",
    "shard_params",
    "shard_batch",
]

from .multihost import (
    initialize_distributed,
    all_gather_host_arrays,
    barrier,
    broadcast_scalar,
)
__all__ += [
    "initialize_distributed",
    "all_gather_host_arrays",
    "barrier",
    "broadcast_scalar",
]
