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


def test_route_rejects_the_r04_driver_env():
    # MULTICHIP_r04 rc=1: the driver exported JAX_PLATFORMS=cpu + a forced
    # device count, but the sitecustomize axon override was still active
    # (pool IPs non-empty) and the in-process route saw ONE axon device.
    # That env must route to the subprocess.
    r04_env = {
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
        "PALLAS_AXON_POOL_IPS": "10.0.0.1",
    }
    assert not graft._route_in_process(8, r04_env)
    # pool IPs merely UNSET is equally untrusted (sitecustomize default-on)
    assert not graft._route_in_process(
        8, {"JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=8"})
    # too few forced devices
    assert not graft._route_in_process(
        8, {"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": "",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4"})
    # wrong platform
    assert not graft._route_in_process(
        8, {"JAX_PLATFORMS": "", "PALLAS_AXON_POOL_IPS": "",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=8"})
    # the fully-forced conftest env IS trusted
    assert graft._route_in_process(
        8, {"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": "",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=8"})


def test_in_process_failure_falls_back_to_subprocess(monkeypatch):
    # Even when the env looks trusted, a body failure (e.g. a backend that
    # still surfaced the wrong device count) must retry via the
    # self-provisioned subprocess rather than leave a red driver record.
    calls = {}

    def boom(n):
        calls["body"] = n
        raise ValueError("mesh 8x1x1 needs 8 devices, have 1")

    class FakeProc:
        returncode = 0
        stdout = "dryrun ok\n"
        stderr = ""

    def fake_run(cmd, **kw):
        calls["subprocess"] = (cmd, kw["env"])
        return FakeProc()

    monkeypatch.setattr(graft, "_dryrun_body", boom)
    monkeypatch.setattr(graft.subprocess, "run", fake_run)
    graft.dryrun_multichip(8)  # must NOT raise
    assert calls["body"] == 8
    cmd, env = calls["subprocess"]
    assert env["PALLAS_AXON_POOL_IPS"] == ""
    assert env["JAX_PLATFORMS"] == "cpu"
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]


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
