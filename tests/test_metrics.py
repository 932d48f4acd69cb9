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
