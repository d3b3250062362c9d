"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
paths (mesh/pjit/shard_map) are exercised without TPU hardware.

Note: this environment ships a sitecustomize that pins JAX_PLATFORMS=axon
(the TPU tunnel), so plain env vars are not enough — we must override via
jax.config before the backend initializes.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu"
