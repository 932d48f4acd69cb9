import pytest

from computervision_codes_tpu.data import resolve_split
from computervision_codes_tpu.data.splits import _CROSSVAL_FOLDS


def test_crossval_fold1_matches_reference_semantics():
    # reference: MT4MTLKD/Spatial_cnn/dataloader.py:74-88
    s = resolve_split("cholect45-crossval", test_fold=1)
    folds = _CROSSVAL_FOLDS["cholect45-crossval"]
    train_ids = sum((folds[k] for k in (2, 3, 4, 5)), [])
    assert list(s.test) == ["VID{}".format(str(v).zfill(2)) for v in folds[1]]
    assert list(s.val) == ["VID{}".format(str(v).zfill(2)) for v in train_ids[-5:]]
    assert list(s.train) == ["VID{}".format(str(v).zfill(2)) for v in train_ids[:-5]]
    assert len(s.train) == 31 and len(s.val) == 5 and len(s.test) == 9


def test_no_overlap_between_splits():
    for variant in ("cholect45-crossval", "cholect50-crossval", "cholect50",
                    "cholect50-challenge", "cholect45-challenge"):
        for fold in ((1, 2, 3, 4, 5) if "crossval" in variant else (1,)):
            s = resolve_split(variant, fold)
            assert not (set(s.train) & set(s.val))
            assert not (set(s.train) & set(s.test))
            assert not (set(s.val) & set(s.test))


def test_video_counts():
    assert len(resolve_split("cholect45-crossval", 3).all_videos) == 45
    assert len(resolve_split("cholect50-crossval", 2).all_videos) == 50
    assert len(resolve_split("cholect50").all_videos) == 50


def test_alias_and_errors():
    assert resolve_split("cholect45", 2).variant == "cholect45-crossval"
    with pytest.raises(ValueError):
        resolve_split("nope")
    with pytest.raises(ValueError):
        resolve_split("cholect45-crossval", 9)
