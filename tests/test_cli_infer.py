"""cli.infer — the one-command video -> per-frame probabilities entry.

The reference has no standalone inference driver (its eval paths only dump
pickles inside train/test loops, MT4MTLKD/Spatial_cnn/test.py:248-286);
this covers the production surface added on top: frame-dir and MJPEG-AVI
input, offline clip batching with tail trim, and the streaming session.
"""

import numpy as np
import pytest
from PIL import Image

from computervision_codes_tpu.cli import infer

GEOM = ["--height", "32", "--width", "56"]
TCN = ["--num_layers_PG", "3", "--num_layers_R", "2", "--num_R", "1",
       "--num_f_maps", "16"]


@pytest.fixture()
def frame_dir(tmp_path, rng):
    d = tmp_path / "VID01"
    d.mkdir()
    for i in range(6):
        arr = rng.integers(0, 256, (40, 64, 3)).astype(np.uint8)
        Image.fromarray(arr).save(d / f"{i:06d}.png")
    return str(d)


def test_infer_offline_frame_dir(frame_dir, tmp_path):
    out = str(tmp_path / "preds.npz")
    res = infer.main(["--video", frame_dir, "--random_init",
                      "--batch", "1", "--clip_len", "4",
                      "--out", out] + GEOM)
    assert res["frames"] == 6
    z = np.load(out)
    for k, c in (("ivt", 100), ("i", 6), ("v", 10), ("t", 15)):
        assert z[k].shape == (6, c)  # tail padding trimmed (6 = 2 clips - 2)
        assert np.isfinite(z[k]).all()
        assert (z[k] >= 0).all() and (z[k] <= 1).all()


@pytest.mark.slow
def test_infer_streaming_frame_dir(frame_dir):
    res = infer.main(["--video", frame_dir, "--random_init", "--streaming",
                      "--context", "16"] + GEOM + TCN)
    assert res["probs"]["ivt"].shape == (6, 100)
    assert np.isfinite(res["probs"]["ivt"]).all()


@pytest.mark.slow
def test_infer_video_container(tmp_path, rng):
    from computervision_codes_tpu.data import native
    from computervision_codes_tpu.data.synthetic import write_mjpeg_avi

    if not native.video_supported():
        pytest.skip("libdataplane.so predates dp_video_*")
    frames = rng.integers(0, 256, (5, 40, 64, 3)).astype(np.uint8)
    avi = write_mjpeg_avi(str(tmp_path / "v.avi"), frames, fps=25)
    res = infer.main(["--video", avi, "--random_init",
                      "--batch", "1", "--clip_len", "4"] + GEOM)
    assert res["frames"] == 5
    assert res["probs"]["ivt"].shape == (5, 100)


def test_infer_requires_weights_source(frame_dir):
    with pytest.raises(ValueError, match="servable"):
        infer.main(["--video", frame_dir, "--batch", "1",
                    "--clip_len", "4"] + GEOM)


def test_infer_rejects_unknown_input(tmp_path):
    p = tmp_path / "x.mp4"
    p.write_bytes(b"\x00")
    with pytest.raises(ValueError, match="container"):
        infer.main(["--video", str(p), "--random_init"])
