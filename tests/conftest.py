"""Test configuration: force CPU JAX with a virtual 8-device mesh.

Multi-chip code paths are validated on a simulated mesh
(SURVEY.md §4: XLA_FLAGS=--xla_force_host_platform_device_count=N).
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
