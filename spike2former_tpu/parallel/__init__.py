from .mesh import (
    distributed_init, make_mesh, batch_sharding, replicated, shard_batch,
    replicate, spatial_sharding,
)

__all__ = [
    "distributed_init", "make_mesh", "batch_sharding", "replicated",
    "shard_batch", "replicate", "spatial_sharding",
]
