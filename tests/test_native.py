import os

import numpy as np
import pytest

from computervision_codes_tpu.data import native
from computervision_codes_tpu.data.transforms import eval_transform

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native/libdataplane.so not built")


@pytest.fixture
def png_files(tmp_path, rng):
    from PIL import Image

    paths = []
    for i in range(4):
        arr = rng.integers(0, 256, (37, 53, 3)).astype(np.uint8)
        p = str(tmp_path / f"f{i}.png")
        Image.fromarray(arr).save(p)
        paths.append(p)
    return paths


def test_native_decode_matches_pil(png_files):
    from PIL import Image

    size = (24, 40)
    got = native.decode_batch(png_files, size)
    assert got.shape == (4, 24, 40, 3)
    for i, p in enumerate(png_files):
        want = eval_transform(Image.open(p), size)
        # bilinear implementations differ by tiny LSBs
        np.testing.assert_allclose(got[i], want, atol=0.03)


def test_native_decode_jpeg(tmp_path, rng):
    from PIL import Image

    arr = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    p = str(tmp_path / "x.jpg")
    Image.fromarray(arr).save(p, quality=95)
    out = native.decode_batch([p], (16, 16))
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(out).all()


def test_native_missing_file_raises(png_files):
    with pytest.raises(IOError):
        native.decode_batch(png_files + ["/nonexistent.png"], (8, 8))


def test_native_uint8_path_matches_float_path(png_files):
    """decode_batch_u8 + host-side normalize == decode_batch (float)."""
    from computervision_codes_tpu.data.transforms import (IMAGENET_MEAN,
                                                          IMAGENET_STD)

    size = (24, 40)
    u8 = native.decode_batch_u8(png_files, size, n_threads=2)
    assert u8.dtype == np.uint8 and u8.shape == (4, 24, 40, 3)
    flt = native.decode_batch(png_files, size, n_threads=2)
    normed = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(normed, flt, atol=1e-6)


def test_native_jpeg_decode_at_scale_close_to_pil(tmp_path, rng):
    """jpeg decode at M/8 scale + resize stays close to PIL's full-res
    decode + resize (different filter chains -> looser tolerance)."""
    from PIL import Image

    from computervision_codes_tpu.data.transforms import eval_transform

    arr = rng.integers(0, 256, (480 // 8, 854 // 8, 3)).astype(np.uint8)
    big = np.asarray(Image.fromarray(arr).resize((854, 480),
                                                 Image.BILINEAR))
    p = str(tmp_path / "frame.jpg")
    Image.fromarray(big).save(p, quality=95)
    size = (256, 448)
    got = native.decode_batch([p], size)[0]
    want = eval_transform(Image.open(p), size)
    # smooth content: the scaled-IDCT chain resamples differently than
    # full-res-decode-then-resize; one normalized LSB is ~0.0175, so this
    # bounds the drift to ~3.5 LSB mean / ~2.8% of range max —
    # sub-perceptual, and the int8-PTQ accuracy guard (mAP drift <=0.008)
    # was measured with far larger input perturbations
    assert np.mean(np.abs(got - want)) < 0.06
    assert np.max(np.abs(got - want)) < 0.7


@pytest.fixture
def mjpeg_frames(rng):
    return rng.integers(0, 256, (10, 48, 64, 3)).astype(np.uint8)


def test_video_reader_avi(tmp_path, mjpeg_frames):
    from computervision_codes_tpu.data.synthetic import write_mjpeg_avi

    if not native.video_supported():
        pytest.skip("libdataplane.so predates dp_video_*")
    path = write_mjpeg_avi(str(tmp_path / "v.avi"), mjpeg_frames, fps=25)
    with native.VideoReader(path) as vr:
        assert len(vr) == 10
        assert (vr.width, vr.height) == (64, 48)
        assert vr.fps == pytest.approx(25.0, rel=0.01)

        # strided subset must equal the per-file decode of the SAME jpegs
        # (identical decode+resize code path, so byte-identical)
        import io

        from PIL import Image

        idx = [0, 3, 7, 9, 3]  # repeats allowed
        paths = []
        for i, n in enumerate(sorted(set(idx))):
            buf = io.BytesIO()
            Image.fromarray(mjpeg_frames[n]).save(buf, format="JPEG",
                                                  quality=90)
            p = str(tmp_path / f"f{n}.jpg")
            open(p, "wb").write(buf.getvalue())
            paths.append((n, p))
        got = vr.read_u8(idx, (24, 40))
        ref = native.decode_batch_u8([p for _, p in paths], (24, 40))
        by_frame = {n: ref[i] for i, (n, _) in enumerate(paths)}
        for row, n in zip(got, idx):
            np.testing.assert_array_equal(row, by_frame[n])

        # float path agrees with the u8 path + normalization
        gotf = vr.read(idx[:2], (24, 40))
        assert gotf.shape == (2, 24, 40, 3) and gotf.dtype == np.float32

        with pytest.raises(IOError):
            vr.read_u8([99], (24, 40))


def test_video_reader_raw_stream(tmp_path, mjpeg_frames):
    import io

    from PIL import Image

    if not native.video_supported():
        pytest.skip("libdataplane.so predates dp_video_*")
    blob = b""
    for f in mjpeg_frames[:4]:
        buf = io.BytesIO()
        Image.fromarray(f).save(buf, format="JPEG", quality=90)
        blob += buf.getvalue()
    path = str(tmp_path / "v.mjpg")
    open(path, "wb").write(blob)
    with native.VideoReader(path) as vr:
        assert len(vr) == 4
        out = vr.read_u8([0, 1, 2, 3], (24, 40))
        assert out.shape == (4, 24, 40, 3)
        # frame content differs frame to frame (no off-by-one duplication)
        assert not np.array_equal(out[0], out[1])


def test_video_reader_rejects_non_video(tmp_path):
    if not native.video_supported():
        pytest.skip("libdataplane.so predates dp_video_*")
    p = str(tmp_path / "x.avi")
    open(p, "wb").write(b"not a video at all, just bytes")
    with pytest.raises(IOError):
        native.VideoReader(p)


def test_container_dataset_pipeline(tmp_path, rng):
    """An MJPEG-AVI dataset layout (<root>/data/VIDxx.avi in place of the
    reference's PNG dirs) flows through CholecDataset + batch_iterator:
    train (PIL-wrapped container frames) and eval (native index decode)."""
    import jax

    from computervision_codes_tpu.data.pipeline import (CholecDataset,
                                                        batch_iterator)
    from computervision_codes_tpu.data.synthetic import write_synthetic_dataset

    if not native.video_supported():
        pytest.skip("libdataplane.so predates dp_video_*")
    root = str(tmp_path / "ds")
    vids = ["VID01", "VID02"]
    write_synthetic_dataset(root, vids, frames_per_video=4, height=32,
                            width=56, container=True)
    assert not (tmp_path / "ds" / "data" / "VID01").exists()

    ds = CholecDataset(root, image_size=(24, 40))
    # train path: container frame -> PIL -> augmentations
    item = ds.load_frame("VID01", 2, rng=np.random.default_rng(0))
    assert item["image"].shape == (24, 40, 3)
    # eval path (native batch decode by frame index, mixed videos)
    seen = 0
    for batch in batch_iterator(ds, vids, batch_size=3, train=False):
        assert batch["image"].shape[1:] == (24, 40, 3)
        assert np.isfinite(batch["image"]).all()
        seen += int(batch["valid"].sum())
    assert seen == 8
