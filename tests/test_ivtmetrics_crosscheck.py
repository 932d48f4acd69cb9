"""Dual-implementation cross-check of the north-star metric.

metrics/recognition.py (from-scratch AP, transcribed spec) vs
tests/ivtmetrics_second.py (independent author-pass leaning on sklearn) on
randomized multi-video fixtures: ties, all-negative classes, ignore_null,
open videos. Agreement bounds the risk that a single transcription misread
ivtmetrics 0.0.6's conventions (VERDICT r2 missing #2 / weak #6).

tests/goldens/ adds the one-command certification path for a networked
machine with the real package installed (see tests/goldens/README.md);
test_against_goldens consumes its output when present.
"""

import os

import numpy as np
import pytest

from ivtmetrics_second import RecognitionSecond, load_bank

from computervision_codes_tpu.metrics import Recognition

COMPONENTS = ("ivt", "i", "v", "t", "iv", "it")


def _random_case(seed: int, open_last: bool = False):
    """Randomized multi-video (targets, predictions) lists with ties and
    rare/absent classes."""
    rng = np.random.default_rng(seed)
    n_videos = int(rng.integers(1, 5))
    videos = []
    for _ in range(n_videos):
        t_frames = int(rng.integers(4, 40))
        # sparse labels; many classes never positive in a video
        dens = rng.choice([0.01, 0.03, 0.08])
        targets = (rng.random((t_frames, 100)) < dens).astype(np.float64)
        if rng.random() < 0.3:
            targets[:, rng.integers(0, 100, 40)] = 0.0  # force absences
        scores = rng.random((t_frames, 100))
        if rng.random() < 0.5:
            # heavy ties: quantize scores to a handful of levels
            scores = np.round(scores * 4) / 4.0
        videos.append((targets, scores))
    return videos, open_last


def _feed(rec, case):
    videos, open_last = case
    for i, (t, p) in enumerate(videos):
        half = max(1, t.shape[0] // 2)
        rec.update(t[:half], p[:half])
        rec.update(t[half:], p[half:])
        if not (open_last and i == len(videos) - 1):
            rec.video_end()


@pytest.mark.parametrize("seed", range(12))
def test_video_ap_cross_implementation(seed):
    case = _random_case(seed, open_last=(seed % 3 == 0))
    a, b = Recognition(100), RecognitionSecond(100)
    _feed(a, case)
    _feed(b, case)
    for comp in COMPONENTS:
        ra = a.compute_video_AP(comp)
        rb = b.compute_video_AP(comp)
        np.testing.assert_allclose(
            ra["AP"], rb["AP"], atol=1e-9, equal_nan=True,
            err_msg=f"seed {seed} component {comp} video AP")
        np.testing.assert_allclose(ra["mAP"], rb["mAP"], atol=1e-9,
                                   equal_nan=True)


@pytest.mark.parametrize("seed", range(6))
def test_global_ap_and_topk_cross_implementation(seed):
    case = _random_case(seed + 100)
    a, b = Recognition(100), RecognitionSecond(100)
    _feed(a, case)
    _feed(b, case)
    for comp in COMPONENTS:
        ra = a.compute_global_AP(comp)
        rb = b.compute_global_AP(comp)
        np.testing.assert_allclose(
            ra["AP"], rb["AP"], atol=1e-9, equal_nan=True,
            err_msg=f"seed {seed} component {comp} global AP")
    for k in (1, 5, 10):
        assert a.topK(k, "ivt") == pytest.approx(b.topK(k, "ivt"))


@pytest.mark.parametrize("seed", range(6))
def test_ignore_null_cross_implementation(seed):
    """Challenge-eval convention: null verb/target classes dropped."""
    case = _random_case(seed + 200)
    a, b = Recognition(100), RecognitionSecond(100)
    _feed(a, case)
    _feed(b, case)
    for comp in ("v", "t", "ivt", "iv", "it"):
        ra = a.compute_video_AP(comp, ignore_null=True)
        rb = b.compute_video_AP(comp, ignore_null=True)
        np.testing.assert_allclose(
            ra["mAP"], rb["mAP"], atol=1e-9, equal_nan=True,
            err_msg=f"seed {seed} component {comp} ignore_null mAP")


GOLDENS = os.path.join(os.path.dirname(__file__), "goldens", "goldens.npz")


def test_against_goldens():
    """Certify against the REAL ivtmetrics package's outputs, when a
    networked machine has produced them (tests/goldens/certify.py)."""
    if not os.path.exists(GOLDENS):
        pytest.skip("tests/goldens/goldens.npz absent — run "
                    "tests/goldens/certify.py on a machine with "
                    "ivtmetrics installed")
    from goldens.make_fixtures import fixture_cases

    data = np.load(GOLDENS)
    for name, videos in fixture_cases():
        rec = Recognition(100)
        for t, p in videos:
            rec.update(t, p)
            rec.video_end()
        for comp in COMPONENTS:
            got = rec.compute_video_AP(comp)["AP"]
            want = data[f"{name}/video/{comp}"]
            np.testing.assert_allclose(
                got, want, atol=1e-7, equal_nan=True,
                err_msg=f"{name} video AP {comp} vs real ivtmetrics")
            got_g = rec.compute_global_AP(comp)["AP"]
            np.testing.assert_allclose(
                got_g, data[f"{name}/global/{comp}"], atol=1e-7,
                equal_nan=True)
