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
