"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

Tests run on CPU (no TPU needed in CI); the same code paths are
`pjit`-sharded on real TPU meshes. The 8 virtual devices let the
parallel/sharding tests exercise real collectives.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
