"""Device mesh + sharding helpers.

The reference's only parallelism is data-parallel DDP over NCCL
(tools/dist_train.sh, mmengine MMDistributedDataParallel, SyncBN,
``reduce_mean``).  The TPU-native equivalent: one ``jax.sharding.Mesh``
with a ``data`` axis; the train/eval step is ``jit``-ed with batch inputs
sharded over it and parameters replicated.  XLA inserts the gradient
all-reduce, the BN cross-replica statistics and the loss-normalizer psum
automatically (SURVEY §2.13).

An optional ``model`` axis is provided for fully-sharded parameters (FSDP
style) on larger-than-HBM models; the Spike2Former models fit comfortably
per-chip, so the default is pure DP.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, model_axis: int = 1) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_axis == 0
    arr = np.asarray(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading batch axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the image height axis over 'data' — spatial partitioning for
    large-image (e.g. Cityscapes 1024x2048) inference.  XLA/GSPMD inserts
    the conv halo exchanges automatically; this is the TPU answer to the
    reference's absent sequence parallelism (SURVEY §5 long-context notes).
    """
    return NamedSharding(mesh, P(None, "data"))
