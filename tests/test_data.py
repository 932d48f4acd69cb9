import numpy as np

from computervision_codes_tpu.data import (
    FeatureStore,
    load_video_labels,
    video_key,
)
from computervision_codes_tpu.data.synthetic import (
    synthetic_feature_dict,
    write_synthetic_dataset,
)


def test_synthetic_dataset_roundtrip(tmp_path):
    root = str(tmp_path / "cholect")
    write_synthetic_dataset(root, ["VID01", "VID02"], frames_per_video=4,
                            height=16, width=28)
    labels = load_video_labels(root, "VID01")
    assert len(labels) == 4
    assert labels.triplet.shape == (4, 100)
    assert labels.tool.shape == (4, 6)
    assert labels.verb.shape == (4, 10)
    assert labels.target.shape == (4, 15)
    # bank consistency: every triplet positive implies its component positives
    from computervision_codes_tpu.data.bank import load_bank

    bank = load_bank()
    for f in range(4):
        for t in np.nonzero(labels.triplet[f])[0]:
            assert labels.tool[f, bank[t, 1]] == 1
            assert labels.verb[f, bank[t, 2]] == 1
            assert labels.target[f, bank[t, 3]] == 1
    # frame path uses zero-padded id from CSV column 0
    import os

    assert os.path.exists(labels.frame_path(root, 0))


def test_feature_store_pickle_compat(tmp_path):
    store = FeatureStore(str(tmp_path), version="Q2L")
    feats = synthetic_feature_dict(["VID01", "VID07"], num_frames=5, dim=8)
    path = store.save(1, "feats", feats, task="i")
    assert path.endswith("run_Q2L/k1_i_feats.pkl")
    # reference reader protocol: pickle dict keyed by 2-char id
    import pickle

    with open(path, "rb") as f:
        raw = pickle.load(f)
    assert set(raw) == {"01", "07"}
    np.testing.assert_array_equal(raw["07"], feats["VID07"])
    got = store.load_video(1, "feats", "VID07", task="i")
    np.testing.assert_array_equal(got, feats["VID07"])


def test_feature_store_npz(tmp_path):
    store = FeatureStore(str(tmp_path), version="x", fmt="npz")
    feats = synthetic_feature_dict(["VID03"], num_frames=3, dim=4)
    store.save(2, "pred", feats)
    got = store.load(2, "pred", videos=["VID03"])
    np.testing.assert_array_equal(got["03"], feats["VID03"])


def test_video_key():
    assert video_key("VID01") == "01"
    # the reference's last-2-chars keying collides for 3-digit CholecT50 ids
    # (VID110 vs VID10); ours keys the full id and stays unique
    assert video_key("VID111") == "111"
    assert video_key("VID110") != video_key("VID10")
