"""bench.py supervisor contract (VERDICT r3 #1b): transient backend
failures get bounded retries, a hang gets killed, and a total failure
still prints ONE parseable diagnostic JSON line (BENCH_r03 recorded rc=1
with parsed:null after a single 'axon UNAVAILABLE')."""

import json
import os
import subprocess
import sys
import types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _proc(rc, out="", err=""):
    return types.SimpleNamespace(returncode=rc, stdout=out, stderr=err)


def _is_probe(a):
    return "-c" in a[0]


def test_success_relays_child_json(monkeypatch, capsys):
    calls = []

    def fake_run(*a, **k):
        calls.append(a)
        if _is_probe(a):
            return _proc(0)
        return _proc(0, 'warning noise\n{"metric": "m", "value": 1.0}\n')

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._supervise() == 0
    assert len([a for a in calls if not _is_probe(a)]) == 1
    line = capsys.readouterr().out.strip()
    assert json.loads(line)["value"] == 1.0


def test_retryable_failure_retries_then_reports(monkeypatch, capsys):
    calls = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)

    def fake_run(*a, **k):
        calls.append(a)
        return _proc(1, "", "RuntimeError: Unable to initialize backend "
                            "'axon': UNAVAILABLE: TPU backend setup error")

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._supervise(attempts=3) == 1
    # the probe fails every attempt, so the full bench is never launched
    assert len(calls) == 3 and all(_is_probe(a) for a in calls)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    diag = json.loads(line)
    assert diag["value"] == 0.0
    assert "UNAVAILABLE" in diag["error_tail"]


def test_deterministic_failure_does_not_retry(monkeypatch, capsys):
    calls = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)

    def fake_run(*a, **k):
        calls.append(a)
        if _is_probe(a):
            return _proc(0)  # device fine — the bug is in the bench body
        return _proc(1, "", "TypeError: bad code, not infra")

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._supervise(attempts=3) == 1
    # no budget burned on a code bug: one probe + one bench
    assert len([a for a in calls if not _is_probe(a)]) == 1
    diag = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "error" in diag


def test_hang_is_killed_and_retried(monkeypatch, capsys):
    calls = []
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)

    def fake_run(*a, **k):
        calls.append(a)
        if _is_probe(a):
            if len(calls) == 1:
                raise subprocess.TimeoutExpired(cmd="probe", timeout=1)
            return _proc(0)
        return _proc(0, '{"metric": "m", "value": 2.0}\n')

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._supervise() == 0
    assert len([a for a in calls if not _is_probe(a)]) == 1
    assert json.loads(capsys.readouterr().out.strip())["value"] == 2.0
