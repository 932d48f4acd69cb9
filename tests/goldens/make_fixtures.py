"""Deterministic fixture cases for ivtmetrics golden certification.

Shared by certify.py (runs the REAL ivtmetrics package, networked machine)
and test_ivtmetrics_crosscheck.py::test_against_goldens (asserts our
metrics.Recognition matches the recorded goldens offline).
"""

from __future__ import annotations

import numpy as np


def fixture_cases():
    """Yield (name, videos) where videos is a list of (targets, scores),
    each (T, 100) float64. Deterministic — identical on every machine."""
    cases = []

    rng = np.random.default_rng(12345)
    videos = []
    for frames in (24, 31, 17):
        t = (rng.random((frames, 100)) < 0.05).astype(np.float64)
        p = rng.random((frames, 100))
        videos.append((t, p))
    cases.append(("dense_random", videos))

    rng = np.random.default_rng(777)
    videos = []
    for frames in (12, 20):
        t = (rng.random((frames, 100)) < 0.02).astype(np.float64)
        t[:, rng.integers(0, 100, 60)] = 0.0  # many absent classes -> NaN
        p = np.round(rng.random((frames, 100)) * 4) / 4.0  # heavy ties
        videos.append((t, p))
    cases.append(("ties_and_absent", videos))

    rng = np.random.default_rng(2026)
    t = np.zeros((9, 100))
    t[0, 5] = t[3, 5] = 1.0  # one rare class, one video
    p = rng.random((9, 100))
    cases.append(("single_video_rare", [(t, p)]))

    return cases


if __name__ == "__main__":
    for name, videos in fixture_cases():
        print(name, [v[0].shape for v in videos])
