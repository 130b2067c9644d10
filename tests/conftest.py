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
# Persistent compilation cache: the suite compiles hundreds of XLA programs
# and most are identical across runs — on the 1-core CI box the cache cuts
# the fast tier's wall substantially after the first populate (results are
# unaffected: the cache keys on the full HLO + config). Override the
# location with JAX_TEST_CACHE_DIR; disable with JAX_TEST_CACHE_DIR=off.
_cache = os.environ.get("JAX_TEST_CACHE_DIR", ".pytest_jax_cache")
if _cache != "off":
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
