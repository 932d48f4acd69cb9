"""Preemption-safe training (utils/preempt.py + driver wiring)."""

import os
import signal

import numpy as np
import pytest

from computervision_codes_tpu.utils import preempt as preempt_mod
from computervision_codes_tpu.utils.preempt import PreemptionGuard


def test_guard_catches_sigterm_and_restores_handler():
    before = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as guard:
        assert not guard.requested
        os.kill(os.getpid(), signal.SIGTERM)  # caught, not fatal
        assert guard.requested
    assert signal.getsignal(signal.SIGTERM) is before


class _FakeGuard:
    """requested flips True after `after` checks — deterministic driver
    preemption without real signals."""

    def __init__(self, after):
        self._n = 0
        self._after = after

    @property
    def requested(self):
        self._n += 1
        return self._n > self._after


@pytest.mark.slow
def test_driver_preempts_checkpoints_and_resumes(tmp_path, monkeypatch):
    from computervision_codes_tpu.cli import spatial_cnn
    from computervision_codes_tpu.data.splits import resolve_split
    from computervision_codes_tpu.data.synthetic import write_synthetic_dataset

    root = str(tmp_path / "ds")
    split = resolve_split("cholect45-crossval", 1)
    write_synthetic_dataset(root, split.all_videos, frames_per_video=2,
                            height=32, width=56, seed=0)
    ckpt_root = str(tmp_path / "ckpt")
    common = [
        "--data_dir", root, "-k", "1", "--loss_type", "ivt", "-b", "8",
        "--image_height", "32", "--image_width", "56",
        "--version", "pre", "--ckpt_root", ckpt_root, "--val_interval", "99",
    ]

    # preempt after 3 batches of a 5-epoch run
    monkeypatch.setattr(preempt_mod, "install_preemption_guard",
                        lambda: _FakeGuard(3))
    res = spatial_cnn.main(["-t", "--epochs", "5"] + common)
    assert res.get("preempted") is True
    latest = [f for f in os.listdir(f"{ckpt_root}/run_pre")
              if "latest" in f]
    assert latest, os.listdir(f"{ckpt_root}/run_pre")

    # a fresh run resumes from _latest and finishes train+eval cleanly
    monkeypatch.setattr(preempt_mod, "install_preemption_guard",
                        lambda: PreemptionGuard().__enter__())
    res2 = spatial_cnn.main(["-t", "-e", "--epochs", "1", "--resume"]
                            + common)
    assert "preempted" not in res2
    assert 0.0 <= res2["test_mAP"]["ivt"] <= 1.0
