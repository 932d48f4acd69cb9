import numpy as np

from computervision_codes_tpu.serving import InferenceSession


def test_inference_session_roundtrip(rng):
    sess = InferenceSession.create(batch=1, clip_len=4, height=32, width=56)
    clips = rng.integers(0, 256, (1, 4, 32, 56, 3)).astype(np.uint8)
    probs = sess.predict(clips)
    assert probs["ivt"].shape == (1, 4, 100)
    assert probs["i"].shape == (1, 4, 6)
    assert 0.0 <= probs["ivt"].max() <= 1.0
    # pre-normalized float input takes the other branch
    norm = rng.standard_normal((1, 4, 32, 56, 3)).astype(np.float32)
    probs2 = sess.predict(norm)
    assert np.isfinite(probs2["ivt"]).all()


def test_inference_session_shape_guard(rng):
    import pytest

    sess = InferenceSession.create(batch=1, clip_len=4, height=32, width=56)
    with pytest.raises(ValueError):
        sess.predict(np.zeros((1, 8, 32, 56, 3)))


def test_serving_normalizes_dark_uint8_frames(rng):
    """Regression: near-black uint8 clips must still be normalized (dtype
    decides, not a data-dependent magnitude heuristic)."""
    sess = InferenceSession.create(batch=1, clip_len=2, height=32, width=56)
    dark = np.zeros((1, 2, 32, 56, 3), np.uint8)
    bright = np.full((1, 2, 32, 56, 3), 255, np.uint8)
    p_dark = sess.predict(dark)["ivt"]
    p_bright = sess.predict(bright)["ivt"]
    assert np.isfinite(p_dark).all()
    # the two extremes must reach the model as different normalized values
    assert not np.allclose(p_dark, p_bright)


def test_inference_session_quantized(rng):
    """quantize=True serves the int8-PTQ backbone with baked static scales;
    probabilities stay valid and finite."""
    import numpy as np

    sess = InferenceSession.create(batch=1, clip_len=4, height=32, width=56,
                                   quantize=True)
    assert "act_scale" in sess.variables["q_backbone"]["conv1"]
    clips = (rng.random((1, 4, 32, 56, 3)) * 255).astype(np.uint8)
    probs = sess.predict(clips)
    assert probs["ivt"].shape == (1, 4, 100)
    for v in probs.values():
        assert np.isfinite(v).all() and (0 <= v).all() and (v <= 1).all()
