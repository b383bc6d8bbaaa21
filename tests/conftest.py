"""Test configuration: force CPU backend with 8 virtual devices + x64.

The driver's real-TPU runs use bench.py / __graft_entry__.py; the test suite
runs on a virtual 8-device CPU mesh so sharding logic is exercised without
multi-chip hardware.
"""
import os

# must run before jax initializes a backend
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
