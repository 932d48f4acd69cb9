"""Driver-contract tests for __graft_entry__ (the multi-chip dryrun).

Round-1 failure mode: the driver runs ``dryrun_multichip(8)`` in a process
that sees ONE real chip, and the entry point assumed the caller had already
provisioned virtual devices (MULTICHIP_r01.json rc=1). These tests pin the
self-provisioning contract.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft


def test_virtual_mesh_env_scrubs_axon_and_forces_count():
    base = {
        "PALLAS_AXON_POOL_IPS": "10.0.0.1",
        "JAX_PLATFORMS": "axon",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2 --foo=bar",
        "PYTHONPATH": "/root/.axon_site",
    }
    env = graft._virtual_mesh_env(8, base)
    assert env["PALLAS_AXON_POOL_IPS"] == ""
    assert env["JAX_PLATFORMS"] == "cpu"
    # stale count flag replaced, unrelated flags kept
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert "device_count=2" not in env["XLA_FLAGS"]
    assert "--foo=bar" in env["XLA_FLAGS"]
    # repo root importable, axon sitecustomize path preserved
    assert env["PYTHONPATH"].split(os.pathsep)[0] == graft._REPO_ROOT
    assert "/root/.axon_site" in env["PYTHONPATH"]


def test_dryrun_runs_in_process_when_devices_available():
    # conftest provisions 8 virtual CPU devices, so this exercises the
    # driver-budget tier (sharded KD step + seq-parallel checks) without
    # a subprocess.
    graft.dryrun_multichip(4)


import pytest  # noqa: E402


@pytest.mark.slow
def test_dryrun_full_attestations(monkeypatch):
    # the two expensive attestations gated out of the driver path
    # (MULTICHIP_r03 rc=124): TERL MoCo queue consistency across replicas
    # and the MS-TCT ring-attention forward.
    monkeypatch.setenv("GRAFT_DRYRUN_FULL", "1")
    graft.dryrun_multichip(4)
