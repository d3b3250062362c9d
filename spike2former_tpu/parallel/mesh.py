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


def distributed_init(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> tuple[int, int]:
    """Multi-host initialization — the reference's torch.distributed.launch
    / slurm world (tools/dist_train.sh, slurm_train.sh), done the JAX way:
    ``jax.distributed.initialize`` connects every host's runtime so
    ``jax.devices()`` spans the full slice and one Mesh covers ICI+DCN.

    On TPU pods all arguments auto-detect from the environment; pass them
    explicitly for CPU multi-process tests.  Returns (process_id,
    process_count).  Safe to call when already initialized or single-host.
    """
    # NB: must run before ANY backend use (even jax.process_count()
    # initializes XLA and makes distributed.initialize fail).
    if coordinator_address or num_processes or _multihost_env():
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
        except RuntimeError as e:
            if "already" not in str(e).lower():
                raise
    return jax.process_index(), jax.process_count()


def _multihost_env() -> bool:
    import os

    return any(os.environ.get(k) for k in (
        "COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS",
        "TPU_WORKER_HOSTNAMES", "SLURM_NTASKS"))


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
    """Per-process local batch -> globally sharded arrays.

    Single-host: a plain sharded device_put.  Multi-host: each process
    contributes its LOCAL slice of the global batch (the DDP per-rank
    loader convention) and ``make_array_from_process_local_data``
    assembles the global jax.Array across hosts.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), batch)
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
