from .mesh import (
    make_mesh, batch_sharding, replicated, shard_batch, replicate,
)

__all__ = [
    "make_mesh", "batch_sharding", "replicated", "shard_batch", "replicate",
]
