"""Preemption-safe training: checkpoint-and-exit on SIGTERM/SIGINT.

TPU pods are routinely preempted (maintenance, spot reclaim) and the
eviction signal is SIGTERM with a short grace window. The reference has no
story for this — a killed run loses the epoch and its _latest.pth can be
mid-write torch.save garbage. Here:

  * checkpoint writes are already atomic (train/checkpoint.py:55-70
    tmp+rename), so a hard kill never corrupts the previous checkpoint;
  * ``PreemptionGuard`` turns the SOFT kill into a clean stop: the signal
    only sets a flag, the train loop checks it at the next batch boundary,
    saves ``_latest`` and returns — ``--resume`` continues from there.

Drivers install it around their epoch loops; `result["preempted"]` tells
orchestration (cli/crossval, fold scripts) the run is partial.
"""

from __future__ import annotations

import signal
from typing import Sequence


class PreemptionGuard:
    """Context manager: listed signals set ``requested`` instead of killing
    the process; previous handlers are restored on exit. Install in the
    MAIN thread (CPython signal rule)."""

    def __init__(self, signals: Sequence[int] = (signal.SIGTERM,
                                                 signal.SIGINT)):
        self.signals = tuple(signals)
        self.requested = False
        self._prev = {}

    def _handler(self, signum, frame):
        self.requested = True

    def __enter__(self):
        for s in self.signals:
            try:
                self._prev[s] = signal.signal(s, self._handler)
            except ValueError:
                # non-main thread (e.g. a test harness) — degrade to a
                # never-firing guard rather than crashing the driver
                self._prev.pop(s, None)
        return self

    def __exit__(self, *exc):
        for s, prev in self._prev.items():
            signal.signal(s, prev)
        return False


def install_preemption_guard() -> PreemptionGuard:
    """Flat-style install for driver mains (no with-block re-indent):
    handlers stay for the process lifetime, which is exactly a CLI run."""
    return PreemptionGuard().__enter__()
