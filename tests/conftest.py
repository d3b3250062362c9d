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


# ---- slow-test gating -------------------------------------------------------
# Tests marked @pytest.mark.slow (e.g. the flagship-dims full-model parity
# forward, ~10-20 min on this 1-core CPU box) are skipped unless RUN_SLOW=1
# is set or --runslow is passed, so the default suite stays fast.
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="run tests marked slow")


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running (RUN_SLOW=1)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow: set RUN_SLOW=1 or --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
