from .mesh import (
    distributed_init, make_mesh, batch_sharding, replicated, shard_batch,
    replicate, spatial_sharding,
)
from .tp import shard_params_tp, tp_shardings

__all__ = [
    "distributed_init", "make_mesh", "batch_sharding", "replicated",
    "shard_batch", "replicate", "spatial_sharding",
    "shard_params_tp", "tp_shardings",
]
