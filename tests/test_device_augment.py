"""Device-side augmentation (data/device_augment.py) vs the host PIL path
(data/transforms.py reference-parity semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image, ImageOps

from computervision_codes_tpu.data import transforms as T
from computervision_codes_tpu.data.device_augment import (
    autocontrast_u8,
    make_device_augment,
    normalize_u8,
    rotate_expand_resize_u8,
    sharpness_u8,
)


def _u8(rng, b=3, h=24, w=32):
    return rng.integers(0, 256, size=(b, h, w, 3), dtype=np.uint8)


def test_normalize_matches_host(rng):
    x = _u8(rng)
    got = np.asarray(normalize_u8(jnp.asarray(x)))
    want = np.stack([T.to_normalized_array(Image.fromarray(im)) for im in x])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_autocontrast_within_one_level_of_pil(rng):
    # narrow dynamic range so autocontrast actually stretches
    x = (_u8(rng) // 3 + 40).astype(np.uint8)
    got = np.asarray(autocontrast_u8(jnp.asarray(x))).astype(np.int32)
    want = np.stack([np.asarray(ImageOps.autocontrast(Image.fromarray(im)))
                     for im in x]).astype(np.int32)
    assert np.abs(got - want).max() <= 1
    # and the overwhelming majority of pixels are bit-exact
    assert (got == want).mean() > 0.99


def test_autocontrast_flat_channel_identity():
    x = np.full((1, 8, 8, 3), 77, np.uint8)
    got = np.asarray(autocontrast_u8(jnp.asarray(x)))
    np.testing.assert_array_equal(got, x)


def test_sharpness_close_to_pil(rng):
    from PIL import ImageEnhance

    x = _u8(rng, b=2)
    got = np.asarray(sharpness_u8(jnp.asarray(x), 1.6)).astype(np.int32)
    want = np.stack([
        np.asarray(ImageEnhance.Sharpness(Image.fromarray(im)).enhance(1.6))
        for im in x]).astype(np.int32)
    # border ring must be untouched, like PIL's kernel filter
    np.testing.assert_array_equal(got[:, 0], x[:, 0].astype(np.int32))
    np.testing.assert_array_equal(got[:, -1], x[:, -1].astype(np.int32))
    # PIL's integer kernel-filter rounding differs by at most one level
    assert np.abs(got - want).max() <= 1
    assert (got == want).mean() > 0.7


def test_rotate_zero_angle_is_identity(rng):
    x = _u8(rng)
    got = np.asarray(rotate_expand_resize_u8(
        jnp.asarray(x), jnp.zeros(x.shape[0])))
    np.testing.assert_array_equal(got, x)


def test_rotate_close_to_pil_on_smooth_content():
    """PIL = NEAREST rotate w/ expand + BILINEAR resize back; ours is one
    fused bilinear warp. On smooth content they must agree closely."""
    h, w = 32, 48
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = np.stack([
        (255 * xx / (w - 1)), (255 * yy / (h - 1)),
        (255 * (xx + yy) / (w + h - 2))], axis=-1).astype(np.uint8)
    for angle in (17.0, -43.0, 88.0):
        got = np.asarray(rotate_expand_resize_u8(
            jnp.asarray(img[None]), jnp.asarray([angle])))[0]
        pil = Image.fromarray(img).rotate(angle, expand=True)
        want = np.asarray(pil.resize((w, h), Image.BILINEAR))
        err = np.abs(got.astype(np.float32) - want.astype(np.float32))
        assert err.mean() < 6.0, (angle, err.mean())


def test_rotate_two_pass_matches_gather_interior():
    """The TPU-native two-pass warp (shift + GEMM; the rot90 default)
    vs the single-pass gather warp: exact at angle 0, <=1 uint8 level on
    interior content at every angle; only the rotated black-fill
    boundary may differ (the fill blend happens twice)."""
    from computervision_codes_tpu.data.device_augment import (
        rotate_expand_resize_fast)

    h, w = 40, 64
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    base = 128 + 60 * np.sin(yy / 7.0) + 50 * np.cos(xx / 9.0)
    img = np.stack([base, base * 0.8, base * 0.6 + 20],
                   axis=-1).clip(0, 255).astype(np.uint8)
    x = jnp.asarray(np.stack([img] * 5))
    angles = jnp.asarray([0.0, 21.0, -44.0, 57.0, -89.0])
    ref = np.asarray(rotate_expand_resize_u8(x, angles)).astype(np.float32)
    got = np.asarray(rotate_expand_resize_fast(x, angles)).astype(np.float32)
    np.testing.assert_array_equal(got[0], ref[0])  # angle 0 exact
    from scipy import ndimage

    for i in range(1, 5):
        nz = ref[i].sum(-1) > 10
        # erode the content mask (drops the fill-boundary band) and the
        # output frame (edge taps clamp differently between the paths)
        interior = ndimage.binary_erosion(nz, iterations=3)
        interior[:2] = interior[-2:] = False
        interior[:, :2] = interior[:, -2:] = False
        d = np.abs(ref[i] - got[i])[interior]
        assert d.max() <= 2.0, (i, d.max())
        assert d.mean() < 0.5, (i, d.mean())


def test_make_device_augment_flip_semantics(rng):
    """With augs=('vflip',): every sample equals the normalized original or
    its vertical flip; both branches occur at roughly p=0.4."""
    x = _u8(rng, b=64)
    fn = make_device_augment(("vflip",))
    out = np.asarray(fn(jax.random.PRNGKey(3), jnp.asarray(x)))
    base = np.asarray(normalize_u8(jnp.asarray(x)))
    flipped = base[:, ::-1]
    is_f = np.array([np.allclose(out[i], flipped[i], atol=1e-6)
                     for i in range(64)])
    is_o = np.array([np.allclose(out[i], base[i], atol=1e-6)
                     for i in range(64)])
    assert np.all(is_f | is_o)
    assert 5 <= is_f.sum() <= 45  # p=0.4 over 64 samples


def test_make_device_augment_full_list_runs(rng):
    x = _u8(rng, b=4)
    fn = make_device_augment(T.DEFAULT_AUGS)
    out = np.asarray(fn(jax.random.PRNGKey(0), jnp.asarray(x)))
    assert out.shape == x.shape and out.dtype == np.float32
    assert np.isfinite(out).all()
    # normalized range sanity
    assert out.min() >= -3.0 and out.max() <= 3.0


def test_jitter_within_one_level_of_pil(rng):
    from PIL import ImageEnhance

    from computervision_codes_tpu.data.device_augment import jitter_u8
    import jax.numpy as jnp2

    x = _u8(rng, b=3)
    bf = np.array([0.92, 1.0, 1.08], np.float32)
    cf = np.array([0.85, 1.15, 1.0], np.float32)
    got = np.asarray(jitter_u8(jnp2.asarray(x), jnp2.asarray(bf),
                               jnp2.asarray(cf))).astype(np.int32)
    want = []
    for i in range(3):
        im = ImageEnhance.Brightness(Image.fromarray(x[i])).enhance(
            float(bf[i]))
        im = ImageEnhance.Contrast(im).enhance(float(cf[i]))
        want.append(np.asarray(im))
    want = np.stack(want).astype(np.int32)
    assert np.abs(got - want).max() <= 1
    assert (got == want).mean() > 0.95


def test_make_device_augment_rejects_host_only():
    with pytest.raises(ValueError, match="host-only"):
        make_device_augment(("not_an_aug",))


def test_pipeline_device_augment_mode(tmp_path, rng):
    """CholecDataset(device_augment=True) ships raw resized uint8 for train
    frames and keeps the normalized eval path."""
    from computervision_codes_tpu.data.pipeline import CholecDataset
    from computervision_codes_tpu.data.splits import resolve_split
    from computervision_codes_tpu.data.synthetic import write_synthetic_dataset

    root = str(tmp_path / "ds")
    split = resolve_split("cholect45-crossval", 1)
    write_synthetic_dataset(root, split.all_videos[:1], frames_per_video=2,
                            height=16, width=20, seed=0)
    ds = CholecDataset(root, test_fold=1, image_size=(16, 20),
                       device_augment=True)
    v = split.all_videos[0]
    tr = ds.load_frame(v, 0, rng=np.random.default_rng(0))
    assert tr["image"].dtype == np.uint8 and tr["image"].shape == (16, 20, 3)
    ev = ds.load_frame(v, 0, rng=None)
    assert ev["image"].dtype == np.float32
    # two-view mode ships ONE uint8 frame; views are generated on device
    tv = ds.load_frame(v, 0, rng=np.random.default_rng(0), two_views=True)
    assert tv["image"].dtype == np.uint8 and "image2" not in tv


def test_make_device_augment_two_view(rng):
    """Two-view mode: both outputs are valid augmentations of the batch and
    independently random (they differ somewhere with these augs)."""
    x = _u8(rng, b=16)
    fn2 = make_device_augment(("vflip", "hflip"), two_view=True)
    v1, v2 = fn2(jax.random.PRNGKey(5), jnp.asarray(x))
    v1, v2 = np.asarray(v1), np.asarray(v2)
    base = np.asarray(normalize_u8(jnp.asarray(x)))
    cands = [base, base[:, ::-1], base[:, :, ::-1], base[:, ::-1, ::-1]]
    for view in (v1, v2):
        for i in range(16):
            assert any(np.allclose(view[i], c[i], atol=1e-6)
                       for c in cands)
    assert not np.allclose(v1, v2)
