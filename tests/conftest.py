"""Test configuration: force CPU JAX with a virtual 8-device mesh.

Multi-chip code paths are validated on a simulated mesh
(SURVEY.md §4: XLA_FLAGS=--xla_force_host_platform_device_count=N).

NOTE this environment auto-registers the 'axon' TPU backend in every python
process via sitecustomize and overrides JAX_PLATFORMS, so the env var alone
is not enough — we also force the platform through jax.config before any
backend is initialized. Tests must never touch the real TPU: only one
process can hold the TPU tunnel at a time and concurrent users deadlock.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Empty pool-IP list disables the sitecustomize axon auto-registration —
# required both for correctness here and so __graft_entry__._route_in_process
# accepts this env as a proven in-process CPU mesh.
os.environ["PALLAS_AXON_POOL_IPS"] = ""
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on CPU — the axon TPU tunnel only supports one "
        "process and tests would deadlock against other jax users"
    )
