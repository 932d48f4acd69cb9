"""End-to-end CLI smoke: train/eval/dump the spatial stage, then the TCN
stage over the dumped features — the minimum two-stage pipeline through the
real driver surface on a tiny synthetic dataset."""

import numpy as np
import pytest

from computervision_codes_tpu.data.splits import resolve_split
from computervision_codes_tpu.data.synthetic import write_synthetic_dataset


@pytest.fixture(scope="module")
def tiny_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cholect"))
    split = resolve_split("cholect45-crossval", 1)
    write_synthetic_dataset(root, split.all_videos, frames_per_video=2,
                            height=32, width=56, seed=1)
    return root


@pytest.mark.slow
def test_two_stage_pipeline_smoke(tiny_root, tmp_path):
    from computervision_codes_tpu.cli import spatial_cnn, temporal_tcn

    ckpt_root = str(tmp_path / "ckpt")
    res = spatial_cnn.main([
        "-t", "-e", "-d", "--data_dir", tiny_root, "-k", "1",
        "--loss_type", "ivt", "--epochs", "1", "-b", "8",
        "--image_height", "32", "--image_width", "56",
        "--version", "smoke", "--ckpt_root", ckpt_root,
        "--val_interval", "99",
    ])
    assert 0.0 <= res["test_mAP"]["ivt"] <= 1.0
    assert res["dump_path"].endswith("k1_feats.pkl")

    res2 = temporal_tcn.main([
        "-t", "-e", "--data_dir", tiny_root, "-k", "1",
        "--feats_version", "smoke", "--epochs", "1",
        "--num_layers_PG", "2", "--num_layers_R", "2", "--num_f_maps", "8",
        "--version", "smoke", "--ckpt_root", ckpt_root,
        "--val_interval", "99",
    ])
    assert 0.0 <= res2["test_mAP"]["ivt"] <= 1.0


def test_crossval_orchestrator_aggregates(tiny_root, tmp_path):
    """cli.crossval runs a stage across folds and reports per-fold + mean
    (the protocol behind the published Table VII numbers)."""
    from computervision_codes_tpu.cli import crossval
    from computervision_codes_tpu.data.feature_store import FeatureStore
    from computervision_codes_tpu.data.synthetic import synthetic_feature_dict

    split = resolve_split("cholect45-crossval", 1)
    store = FeatureStore(tiny_root + "/data_feats", "cv")
    for fold in (1, 2):
        store.save(fold, "feats",
                   synthetic_feature_dict(split.all_videos, 2, 16, seed=fold))

    res = crossval.main([
        "--stage", "temporal_tcn", "--folds", "1", "2", "--",
        "--data_dir", tiny_root, "-t", "-e", "--feats_version", "cv",
        "--epochs", "1", "--num_layers_PG", "2", "--num_layers_R", "2",
        "--num_f_maps", "8", "--version", "cv",
        "--ckpt_root", str(tmp_path / "cv"), "--val_interval", "99",
    ])
    assert res["stage"] == "temporal_tcn"
    assert set(res["per_fold"]) == {1, 2}
    assert 0.0 <= res["mean"]["ivt"] <= 1.0


@pytest.mark.slow
def test_terl_cam_dump_writes_overlays(tiny_root, tmp_path):
    """--cam_dump: checkpoint -> per-task CAM overlay PNGs, end-to-end
    through the TERL driver (reference TERL/6_baseline_learnT/cam.py:200-278
    is a runnable checkpoint->overlay tool; this is its driver entry)."""
    import os

    from computervision_codes_tpu.cli import terl_learnt

    cam_dir = str(tmp_path / "cams")
    res = terl_learnt.main([
        "--data_dir", tiny_root, "-k", "1", "--backbone", "swin_nano_64",
        "--img_size", "64", "--mlp", "--moco_k", "8", "-b", "4",
        "--version", "camsmoke", "--ckpt_root", str(tmp_path / "ckpt"),
        "--cam_dump", cam_dir, "--cam_frames", "2",
    ])
    paths = res["cam_paths"]
    # 2 frames x 4 tasks x >=1 class each
    assert len(paths) >= 8
    for p in paths:
        assert os.path.exists(p) and os.path.getsize(p) > 0
    names = [os.path.basename(p) for p in paths]
    assert any("_ivt" in n for n in names)
    assert any("_i" in n and "_ivt" not in n for n in names)


@pytest.mark.slow
def test_student_driver_device_augment_smoke(tiny_root, tmp_path):
    """--device_augment: the host ships resized uint8, augmentation +
    normalization run inside the jitted step (data/device_augment.py)."""
    from computervision_codes_tpu.cli import spatial_cnn

    res = spatial_cnn.main([
        "-t", "-e", "--data_dir", tiny_root, "-k", "1",
        "--loss_type", "ivt", "--epochs", "1", "-b", "8",
        "--image_height", "32", "--image_width", "56",
        "--device_augment",
        "--version", "devaug", "--ckpt_root", str(tmp_path / "ckpt"),
        "--val_interval", "99",
    ])
    assert 0.0 <= res["test_mAP"]["ivt"] <= 1.0


@pytest.mark.slow
def test_terl_driver_device_augment_smoke(tiny_root, tmp_path):
    """TERL --device_augment: both contrastive views generated on device
    from one uint8 upload."""
    from computervision_codes_tpu.cli import terl_learnt

    terl_learnt.main([
        "-t", "--data_dir", tiny_root, "-k", "1",
        "--backbone", "swin_nano_64", "--img_size", "64", "--mlp",
        "--moco_k", "8", "-b", "4", "--epochs", "1", "--w_epoch", "1",
        "--device_augment",
        "--version", "devaug2", "--ckpt_root", str(tmp_path / "ckpt"),
        "--val_interval", "99",
    ])


@pytest.mark.slow
def test_teacher_driver_tp_smoke(tiny_root, tmp_path):
    """--tp_devices/--dp_devices on the teacher driver: one epoch + eval of
    a nano Q2L under a 2 (data) x 4 (model) mesh on the 8 virtual devices.
    TP semantics are covered by tests/test_tensor_parallel.py; this pins
    the flag plumbing end-to-end through the real driver surface."""
    from computervision_codes_tpu.cli import spatial_transformer

    res = spatial_transformer.main([
        "-t", "-e", "--data_dir", tiny_root, "-k", "1",
        "--loss_type", "i", "--epochs", "1", "-b", "8",
        "--backbone", "swin_nano_64",
        "--image_height", "64", "--image_width", "64",
        "--dp_devices", "2", "--tp_devices", "4",
        "--version", "tpsmoke", "--ckpt_root", str(tmp_path / "ckpt"),
        "--val_interval", "99",
    ])
    assert 0.0 <= res["test_mAP"]["i"] <= 1.0


def test_prefetch_to_device(rng):
    from computervision_codes_tpu.data.prefetch import prefetch_to_device

    batches = [{"x": rng.standard_normal((2, 3)).astype(np.float32)}
               for _ in range(5)]
    out = list(prefetch_to_device(iter(batches), depth=2))
    assert len(out) == 5
    np.testing.assert_allclose(np.asarray(out[3]["x"]), batches[3]["x"])


def test_ignore_null_protocol_matches_reference():
    """Each driver stage's eval-table ignore_null vs the reference's
    set_chlg_eval (VERDICT r4 weak #5): TCN_black and learnT hardcode the
    challenge protocol (TERL/0_5fold_TCN_black/run.py:142,
    TERL/6_baseline_learnT/run.py:160); the teacher derives it then
    overwrites it to True (Spatial_transformer/run.py:421); the other
    MT4MTLKD stages derive it from the dataset-variant name."""
    from computervision_codes_tpu.cli import temporal_tcn
    from computervision_codes_tpu.cli.common import ignore_null_protocol

    for variant, derived in (("cholect45-crossval", False),
                             ("cholect50-challenge", True)):
        # variant-derived stages
        for stage in ("spatial_cnn", "temporal_mstct", "temporal_tenco"):
            assert ignore_null_protocol(stage, variant) is derived, stage
        # hardcoded-True stages
        for stage in ("spatial_transformer", "terl_learnt", "tcn_black"):
            assert ignore_null_protocol(stage, variant) is True, stage
        # the unified TCN driver's two modes
        assert temporal_tcn.challenge_protocol(True, variant) is True
        assert temporal_tcn.challenge_protocol(False, variant) is derived
