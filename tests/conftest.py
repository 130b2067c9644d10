"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip hardware is not available in CI; sharding logic is validated on
XLA's host-platform virtual devices (the JAX-native fake backend for testing
shard_map, SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Under the axon TPU plugin the JAX_PLATFORMS env var alone is not honored;
# the config update is (verified: devices become CpuDevice).
jax.config.update("jax_platforms", "cpu")
# Matmuls at fp32 everywhere so golden tests compare at fp32 accuracy; the
# production precision policy is set explicitly in the train/render paths.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
