import numpy as np
import pytest

from computervision_codes_tpu.data import bank as bank_mod
from computervision_codes_tpu.metrics import Recognition, average_precision, classwise_ap


def test_average_precision_matches_sklearn(rng):
    from sklearn.metrics import average_precision_score

    for trial in range(20):
        n = int(rng.integers(5, 60))
        y = (rng.random(n) < 0.3).astype(float)
        s = rng.random(n)
        if trial % 3 == 0:  # exercise tie handling
            s = np.round(s, 1)
        ours = average_precision(y, s)
        if y.sum() == 0:
            assert np.isnan(ours)
        else:
            np.testing.assert_allclose(ours, average_precision_score(y, s), rtol=1e-9)


def test_ap_no_positives_is_nan():
    assert np.isnan(average_precision(np.zeros(10), np.random.rand(10)))


def test_perfect_and_worst_ranking():
    y = np.array([1, 1, 0, 0, 0], dtype=float)
    s_good = np.array([0.9, 0.8, 0.3, 0.2, 0.1])
    s_bad = np.array([0.1, 0.2, 0.8, 0.9, 1.0])
    assert average_precision(y, s_good) == pytest.approx(1.0)
    assert average_precision(y, s_bad) < 0.5


def _fill(rec, rng, num_videos=3, frames=16, C=100):
    per_video = []
    for _ in range(num_videos):
        t = (rng.random((frames, C)) < 0.05).astype(float)
        p = rng.random((frames, C))
        rec.update(t[: frames // 2], p[: frames // 2])
        rec.update(t[frames // 2 :], p[frames // 2 :])
        rec.video_end()
        per_video.append((t, p))
    return per_video


def test_video_ap_is_mean_over_videos(rng):
    rec = Recognition(100)
    per_video = _fill(rec, rng)
    got = rec.compute_video_AP("ivt")
    stack = np.stack([classwise_ap(t, p) for t, p in per_video])
    with np.errstate(invalid="ignore"):
        want = np.nanmean(stack, axis=0)
    np.testing.assert_allclose(got["AP"], want, equal_nan=True)
    np.testing.assert_allclose(got["mAP"], np.nanmean(want))


def test_global_ap_concatenates(rng):
    rec = Recognition(100)
    per_video = _fill(rec, rng)
    got = rec.compute_global_AP("ivt")
    t = np.concatenate([v[0] for v in per_video])
    p = np.concatenate([v[1] for v in per_video])
    np.testing.assert_allclose(got["AP"], classwise_ap(t, p), equal_nan=True)


def test_component_disentanglement_max_aggregation(rng):
    bank = bank_mod.load_bank()
    rec = Recognition(100)
    t = np.zeros((4, 100))
    t[0, 7] = 1  # triplet 7 = (i=0, v=0, t=0) per maps.txt row 7
    p = rng.random((4, 100))
    rec.update(t, p)
    rec.video_end()
    got_i = rec.compute_video_AP("i")["AP"]
    assert len(got_i) == 6
    # manual: component score for i-class c is max over triplet columns with bank i==c
    want_col0 = p[:, bank[:, 1] == 0].max(axis=1)
    t_i = np.zeros((4, 6))
    t_i[0, 0] = 1
    np.testing.assert_allclose(got_i[0], average_precision(t_i[:, 0], want_col0))


def test_component_widths(rng):
    rec = Recognition(100)
    _fill(rec, rng, num_videos=1)
    assert len(rec.compute_video_AP("i")["AP"]) == 6
    assert len(rec.compute_video_AP("v")["AP"]) == 10
    assert len(rec.compute_video_AP("t")["AP"]) == 15
    bank = bank_mod.load_bank()
    assert len(rec.compute_video_AP("iv")["AP"]) == len(np.unique(bank[:, 4]))
    assert len(rec.compute_video_AP("it")["AP"]) == len(np.unique(bank[:, 5]))


def test_direct_task_identity(rng):
    rec = Recognition(6)
    t = (rng.random((8, 6)) < 0.3).astype(float)
    p = rng.random((8, 6))
    rec.update(t, p)
    rec.video_end()
    np.testing.assert_allclose(rec.compute_video_AP()["AP"], classwise_ap(t, p),
                               equal_nan=True)


def test_ignore_null_drops_null_classes(rng):
    rec = Recognition(100)
    _fill(rec, rng, num_videos=1)
    full_v = rec.compute_video_AP("v")["AP"]
    chlg_v = rec.compute_video_AP("v", ignore_null=True)["AP"]
    assert len(chlg_v) == len(full_v) - 1  # null_verb dropped


def test_topk_reference_semantics(rng):
    # mirror of MT4MTLKD/Temporal_mstct/run.py:507-523
    rec = Recognition(100)
    t = np.zeros((5, 100))
    p = rng.random((5, 100))
    t[0, 3] = 1
    t[1, 10] = 1
    t[1, 20] = 1
    p[0, 3] = 10.0  # in top-k
    p[1, 10] = 10.0  # in top-k
    p[1, 20] = -10.0  # not in top-k
    rec.update(t, p)
    rec.video_end()
    assert rec.topK(5, "ivt") == pytest.approx(2.0 / 3.0)


def test_reset_and_open_video_included(rng):
    rec = Recognition(100)
    t = (rng.random((6, 100)) < 0.1).astype(float)
    p = rng.random((6, 100))
    rec.update(t, p)  # video not closed
    got = rec.compute_video_AP("ivt")["AP"]
    np.testing.assert_allclose(got, classwise_ap(t, p), equal_nan=True)
    rec.reset_global()
    assert np.isnan(rec.compute_video_AP("ivt")["mAP"])


def test_bank_null_masks():
    assert bank_mod.null_component_mask("v").sum() == 1
    assert bank_mod.null_component_mask("t").sum() == 1
    assert bank_mod.null_component_mask("i").sum() == 0
    assert bank_mod.null_component_mask("ivt").sum() > 0


# -- ivtmetrics convention edge cases (spec in metrics/recognition.py) -----


def test_ap_no_positive_convention_is_sklearn_102_nan():
    """The reference env pins scikit-learn 1.0.2, where a no-positive class
    gets NaN AP (0/0 recall); modern sklearn returns 0.0 instead. We must
    keep NaN: nanmean then EXCLUDES the class, which is what makes
    per-video mAP meaningful when most classes are absent per video."""
    ap = average_precision(np.zeros(5), np.linspace(0, 1, 5))
    assert np.isnan(ap)


def test_ap_tie_handling_matches_sklearn(rng):
    from sklearn.metrics import average_precision_score

    y = (rng.random(64) < 0.3).astype(np.float64)
    y[0] = 1.0  # ensure positives
    # heavy ties: quantized scores
    s = np.round(rng.random(64) * 4) / 4
    np.testing.assert_allclose(average_precision(y, s),
                               average_precision_score(y, s), atol=1e-12)
    # fully constant scores
    np.testing.assert_allclose(
        average_precision(y, np.full(64, 0.5)),
        average_precision_score(y, np.full(64, 0.5)), atol=1e-12)


def test_video_ap_nanmean_ordering():
    """Videos-then-classes nanmean: a class present in one video only is
    averaged over THAT video alone, then weighted equally with classes
    present everywhere — distinct from mean-of-per-video-mAPs."""
    rec = Recognition(num_class=2, bank=np.zeros((0, 4), np.int64))
    # video 1: class 0 ranked perfectly (AP 1.0); class 1 absent (NaN)
    rec.update(np.array([[1, 0], [0, 0]]), np.array([[0.9, 0.1], [0.1, 0.2]]))
    rec.video_end()
    # video 2: class 0 AP 0.5, class 1 AP 0.5
    rec.update(np.array([[1, 0], [0, 1]]), np.array([[0.4, 0.9], [0.6, 0.5]]))
    rec.video_end()
    res = rec.compute_video_AP("ivt")
    np.testing.assert_allclose(res["AP"], [0.75, 0.5])
    np.testing.assert_allclose(res["mAP"], (0.75 + 0.5) / 2)  # = 0.625
    # mean of per-video mAPs would be (1.0 + 0.5)/2 = 0.75 — must differ
    assert abs(res["mAP"] - 0.75) > 1e-9


def test_video_ap_class_absent_everywhere_excluded():
    rec = Recognition(num_class=3, bank=np.zeros((0, 4), np.int64))
    for _ in range(2):
        rec.update(np.array([[1, 0, 0]]), np.array([[0.9, 0.5, 0.4]]))
        rec.video_end()
    res = rec.compute_video_AP("ivt")
    assert np.isnan(res["AP"][1]) and np.isnan(res["AP"][2])
    np.testing.assert_allclose(res["mAP"], 1.0)  # nanmean over class 0 only


def test_video_with_no_positives_at_all():
    """An all-background video contributes NaN rows, not zeros."""
    rec = Recognition(num_class=2, bank=np.zeros((0, 4), np.int64))
    rec.update(np.array([[1, 1]]), np.array([[0.9, 0.9]]))
    rec.video_end()
    rec.update(np.zeros((3, 2)), np.full((3, 2), 0.5))
    rec.video_end()
    res = rec.compute_video_AP("ivt")
    np.testing.assert_allclose(res["AP"], [1.0, 1.0])
    np.testing.assert_allclose(res["mAP"], 1.0)
