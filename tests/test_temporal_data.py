import numpy as np

from computervision_codes_tpu.data.class_weights import weight_balancing
from computervision_codes_tpu.data.feature_store import FeatureStore
from computervision_codes_tpu.data.synthetic import write_synthetic_dataset
from computervision_codes_tpu.data.temporal import (
    TemporalSequenceDataset,
    black_frame_dedup,
    pad_sequence_batch,
    pick_bucket,
    sample_clip,
    sample_window,
    TemporalSequence,
)


def test_black_frame_dedup_reference_semantics():
    # frames 2 and 3 identical -> drop BOTH (reference drops idx1 and idx1+1)
    f = np.array([[1.0], [2.0], [3.0], [3.0], [5.0]], np.float32)
    keep = black_frame_dedup(f)
    np.testing.assert_array_equal(keep, [0, 1, 4])
    # nothing to drop
    f2 = np.array([[1.0], [2.0]], np.float32)
    np.testing.assert_array_equal(black_frame_dedup(f2), [0, 1])


def test_temporal_dataset_alignment(tmp_path, rng):
    root = str(tmp_path / "d")
    videos = ["VID01", "VID02"]
    write_synthetic_dataset(root, videos, frames_per_video=6, height=8,
                            width=8, write_images=False)
    store = FeatureStore(str(tmp_path / "feats"), "v0")
    feats = {v: rng.standard_normal((6, 16)).astype(np.float32) for v in videos}
    # make frames 1,2 of VID01 identical -> dedup drops both
    feats["VID01"][2] = feats["VID01"][1]
    store.save(1, "feats", feats)

    ds = TemporalSequenceDataset(root, store, 1, videos, dedup_black=True)
    s1 = ds["VID01"]
    assert s1.length == 4
    np.testing.assert_array_equal(s1.kept_mask, [1, 0, 0, 1, 1, 1])
    assert s1.labels["ivt"].shape == (4, 100)
    s2 = ds["VID02"]
    assert s2.length == 6

    # without dedup, lengths preserved
    ds2 = TemporalSequenceDataset(root, store, 1, videos, dedup_black=False)
    assert ds2["VID01"].length == 6


def test_clip_and_window_sampling(rng):
    seq = TemporalSequence(
        "VID01", rng.standard_normal((500, 4)).astype(np.float32),
        {"ivt": np.zeros((500, 100), np.float32)})
    lens = set()
    for i in range(20):
        c = sample_clip(np.random.default_rng(i), seq, full_prob=0.3)
        assert 10 <= c.length <= 500
        assert c.labels["ivt"].shape[0] == c.length
        lens.add(c.length)
    assert len(lens) > 3  # actually samples varied clips
    w = sample_window(np.random.default_rng(0), seq, window=256)
    assert w.length == 256


def test_bucket_padding(rng):
    seq = TemporalSequence(
        "VID01", rng.standard_normal((300, 4)).astype(np.float32),
        {"ivt": np.ones((300, 100), np.float32)})
    assert pick_bucket(300) == 512
    batch = pad_sequence_batch(seq)
    assert batch["features"].shape == (1, 512, 4)
    assert batch["frame_mask"].sum() == 300
    assert batch["label_ivt"].shape == (512, 100)
    assert batch["label_ivt"][300:].sum() == 0
    assert int(batch["length"]) == 300


def test_weight_balancing_tables():
    w = weight_balancing("cholect45-crossval", fold=1)
    assert len(w["tool"]) == 6 and len(w["verb"]) == 10 and len(w["target"]) == 15
    w50 = weight_balancing("cholect50")
    assert len(w50["tool"]) == 6
    for fold in (1, 2, 3, 4, 5):
        wf = weight_balancing("cholect50-crossval", fold)
        assert len(wf["target"]) == 15


def test_tail_stats():
    from computervision_codes_tpu.data.tail_stats import (
        class_counts_sorted_by_id,
        instance_counts,
        tail_triplet_classes,
    )

    counts = instance_counts()
    assert counts["i"].shape == (6, 2)
    assert counts["ivt"].shape == (100, 2)
    # descending counts within each section
    assert (np.diff(counts["ivt"][:, 1]) <= 0).all()
    tails = tail_triplet_classes(84)
    assert len(tails) == 84
    # the 3 hardcoded head classes are the most frequent -> not in the tail
    for head in (17, 60, 19):
        assert head not in tails
    assert tail_triplet_classes(10, explicit=[1, 2]) == [1, 2]
    by_id = class_counts_sorted_by_id("i")
    assert by_id.shape == (6,)


def test_bucket_beyond_list_never_truncates():
    from computervision_codes_tpu.data.temporal import (
        TemporalSequence,
        pad_sequence_batch,
        pick_bucket,
    )

    assert pick_bucket(9000) == 16384
    seq = TemporalSequence("VID01", np.zeros((9000, 4), np.float32),
                           {"ivt": np.zeros((9000, 100), np.float32)})
    batch = pad_sequence_batch(seq)
    assert batch["features"].shape[1] == 16384
    assert int(batch["length"]) == 9000  # nothing truncated
