import numpy as np

from computervision_codes_tpu.utils.cam import (
    draw_cam,
    normalize_cam,
    render_cam_overlay,
)
from computervision_codes_tpu.utils.misc import (
    ModelEma,
    clean_state_dict,
    cutout,
    load_config,
    voc_mAP,
)


def test_normalize_and_render_cam(rng, tmp_path):
    img = rng.integers(0, 256, (32, 48, 3)).astype(np.uint8)
    cam = rng.standard_normal((4, 6))
    n = normalize_cam(cam)
    assert n.min() >= 0 and n.max() <= 1
    out = render_cam_overlay(img, cam)
    assert out.shape == img.shape and out.dtype == np.uint8
    path = draw_cam(img, cam, str(tmp_path / "cam.png"))
    import os

    assert os.path.exists(path)
    # constant cam -> zeros, no crash
    assert normalize_cam(np.ones((3, 3))).sum() == 0


def test_clean_state_dict():
    sd = {"module.a.b": 1, "c": 2}
    assert clean_state_dict(sd) == {"a.b": 1, "c": 2}


def test_model_ema():
    import jax.numpy as jnp

    ema = ModelEma({"w": jnp.zeros(2)}, decay=0.9)
    out = ema.update({"w": jnp.ones(2)})
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1, rtol=1e-6)
    out = ema.set({"w": jnp.full(2, 5.0)})
    np.testing.assert_allclose(np.asarray(out["w"]), 5.0)


def test_cutout(rng):
    img = np.zeros((20, 20, 3), np.uint8) + 7
    out = cutout(rng, img, factor=0.5)
    assert out.shape == img.shape
    assert (img == 7).all()  # original untouched


def test_voc_map(rng):
    y = (rng.random((30, 5)) < 0.3).astype(float)
    y[:, 0] = 0  # class with no positives -> NaN, excluded from mean
    s = y + 0.1 * rng.random((30, 5))
    assert voc_mAP(s, y) > 0.95


def test_load_config(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("model:\n  name: cvt\n  dims: [1, 2]\nlr: 0.1\n")
    cfg = load_config(str(p))
    assert cfg.model.name == "cvt"
    assert cfg.model.dims == [1, 2]
    assert cfg.lr == 0.1
