"""Test configuration: force CPU with 8 virtual devices (sharding tests)
and float64 (oracle parity), before jax initializes."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

# the env var alone is not enough when a PJRT plugin self-registers at
# interpreter startup (sitecustomize); the config update always wins
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compilation cache: repeat suite runs skip XLA recompiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_evflow_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(42)
