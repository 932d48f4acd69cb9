import numpy as np
import pytest

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
    assert "w" in sess.variables["q_backbone"]["conv1"]  # float stem
    assert "act_scale" in sess.variables["q_backbone"]["layer1_0"]["conv1"]
    clips = (rng.random((1, 4, 32, 56, 3)) * 255).astype(np.uint8)
    probs = sess.predict(clips)
    assert probs["ivt"].shape == (1, 4, 100)
    for v in probs.values():
        assert np.isfinite(v).all() and (0 <= v).all() and (v <= 1).all()


def test_streaming_matches_offline_causal(rng):
    """StreamingSession output at step t == offline causal e2e output at
    position t once t exceeds the TCN receptive field (exact online
    inference — the ring buffer's zero prefix falls outside the causal
    cone)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from computervision_codes_tpu.models.pipeline import EndToEndRecognizer
    from computervision_codes_tpu.serving import StreamingSession

    kw = dict(num_layers_pg=3, num_layers_r=2, num_refinements=2,
              num_f_maps=16)
    ctx, h, w = 32, 32, 56
    model = EndToEndRecognizer(causal=True, dtype=jnp.float32, **kw)
    clips = jnp.asarray(rng.standard_normal((1, ctx, h, w, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(3), clips[:, :4])
    offline = jax.nn.sigmoid(
        model.apply(variables, clips)["ivt"].astype(jnp.float32))

    sess = StreamingSession.create(context=ctx, height=h, width=w,
                                   variables=variables, dtype=jnp.float32,
                                   **kw)
    # receptive field: pg d=1,2,4 (reach 14) + 2 refinements x (d=1,2 -> 6)
    rf = 14 + 2 * 6
    for t in range(ctx):
        probs = sess.push(np.asarray(clips[0, t], np.float32))
        if t >= rf:
            np.testing.assert_allclose(
                probs["ivt"], np.asarray(offline[0, t]), atol=1e-5,
                err_msg=f"step {t}")
    assert sess.frames_seen == ctx
    sess.reset()
    assert sess.frames_seen == 0


def test_streaming_quantized(rng):
    """StreamingSession(quantize=True): int8 backbone per frame, valid
    finite probabilities."""
    import numpy as np

    from computervision_codes_tpu.serving import StreamingSession

    sess = StreamingSession.create(
        context=8, height=32, width=56, quantize=True,
        num_layers_pg=2, num_layers_r=2, num_refinements=1, num_f_maps=8)
    assert "w" in sess.variables["q_backbone"]["conv1"]  # float stem
    assert "act_scale" in sess.variables["q_backbone"]["layer1_0"]["conv1"]
    for _ in range(3):
        probs = sess.push((rng.random((32, 56, 3)) * 255).astype(np.uint8))
    assert probs["ivt"].shape == (100,)
    for v in probs.values():
        assert np.isfinite(v).all() and (0 <= v).all() and (v <= 1).all()


def test_multi_stream_independence(rng):
    """streams=S batches independent videos: each stream's output equals a
    single-stream session fed the same frames (no cross-stream mixing)."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from computervision_codes_tpu.models.pipeline import EndToEndRecognizer
    from computervision_codes_tpu.serving import StreamingSession

    kw = dict(num_layers_pg=2, num_layers_r=2, num_refinements=1,
              num_f_maps=8)
    h, w, ctx, steps = 32, 56, 8, 4
    model = EndToEndRecognizer(causal=True, dtype=jnp.float32, **kw)
    variables = model.init(jax.random.PRNGKey(5),
                           jnp.zeros((1, 4, h, w, 3), jnp.float32))
    frames = rng.standard_normal((steps, 2, h, w, 3)).astype(np.float32)

    multi = StreamingSession.create(context=ctx, height=h, width=w,
                                    variables=variables, streams=2,
                                    dtype=jnp.float32, **kw)
    singles = [StreamingSession.create(context=ctx, height=h, width=w,
                                       variables=variables,
                                       dtype=jnp.float32, **kw)
               for _ in range(2)]
    for t in range(steps):
        pm = multi.push(frames[t])
        ps = [singles[s].push(frames[t, s]) for s in range(2)]
        assert pm["ivt"].shape == (2, 100)
        for s in range(2):
            np.testing.assert_allclose(pm["ivt"][s], ps[s]["ivt"],
                                       atol=1e-5)
    # per-stream reset only clears that stream — buffer AND frame counter
    multi.reset(stream=0)
    assert float(jnp.abs(multi.buffer[0]).max()) == 0.0
    assert float(jnp.abs(multi.buffer[1]).max()) > 0.0
    assert list(multi.frames_seen_per_stream) == [0, steps]


def test_receptive_field_and_context_warning():
    """create() computes the causal receptive field from the layer config
    and warns when the ring-buffer context cannot cover it (ADVICE r2:
    the default 11+3x10 TCN reaches 10,233 frames — far past context=256 —
    so 'exact' claims must be qualified)."""
    import warnings

    import jax.numpy as jnp

    from computervision_codes_tpu.serving import (StreamingSession,
                                                  tcn_receptive_field)

    assert tcn_receptive_field(11, 10, 3) == 10233
    assert tcn_receptive_field(3, 2, 2) == 27  # test-size config
    kw = dict(num_layers_pg=2, num_layers_r=2, num_refinements=1,
              num_f_maps=8)  # rf = 1 + 6 + 6 = 13
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        sess = StreamingSession.create(context=8, height=32, width=56,
                                       dtype=jnp.float32, **kw)
    assert any("receptive field" in str(w.message) for w in caught)
    assert sess.receptive_field == 13
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        StreamingSession.create(context=16, height=32, width=56,
                                dtype=jnp.float32, **kw)
    assert not any("receptive field" in str(w.message) for w in caught)


@pytest.mark.slow
def test_teacher_session():
    """TeacherSession: compiled Q2L teacher serving — uint8 and float
    inputs, per-task probabilities + bus features, int8 config close."""
    import pytest

    from computervision_codes_tpu.serving import TeacherSession

    sess = TeacherSession.create(batch=2, img_size=64,
                                 backbone="swin_nano_64", loss_type="i")
    rng = np.random.default_rng(3)
    frames_u8 = rng.integers(0, 256, (2, 64, 64, 3), np.uint8)
    out = sess.predict(frames_u8)
    assert out["i"].shape == (2, 6)
    assert out["feature"].ndim == 2 and out["feature"].shape[0] == 2
    assert np.all((out["i"] >= 0) & (out["i"] <= 1))

    qsess = TeacherSession.create(batch=2, img_size=64,
                                  backbone="swin_nano_64", loss_type="i",
                                  variables=sess.variables, quantize=True)
    qout = qsess.predict(frames_u8)
    # int8 dense interception: PTQ-grade drift on probabilities
    assert np.max(np.abs(qout["i"] - out["i"])) < 0.05

    with pytest.raises(ValueError):
        sess.predict(np.zeros((1, 64, 64, 3), np.uint8))


@pytest.mark.slow
def test_inference_session_mesh_matches_single(rng):
    """Data-parallel serving (batch sharded over the mesh's data axis,
    variables replicated): identical probabilities to the single-device
    session — per-clip inference partitions with no collectives."""
    import jax

    from computervision_codes_tpu.parallel.mesh import make_mesh

    kw = dict(batch=4, clip_len=2, height=32, width=56)
    single = InferenceSession.create(**kw)
    mesh = make_mesh(n_data=4, devices=jax.devices()[:4])
    sharded = InferenceSession.create(mesh=mesh,
                                      variables=single.variables, **kw)
    clips = rng.integers(0, 256, (4, 2, 32, 56, 3)).astype(np.uint8)
    want = single.predict(clips.copy())
    got = sharded.predict(clips)
    for k in want:
        # partitioning changes conv/reduce tiling, and the random-init
        # bf16 TCN chain amplifies that ~1e-3 relative noise — guard by
        # correlation + bound, like the int8 fidelity tests
        assert np.corrcoef(got[k].ravel(), want[k].ravel())[0, 1] > 0.999
        assert np.abs(got[k] - want[k]).max() < 0.1
    with pytest.raises(ValueError):
        InferenceSession.create(mesh=mesh, batch=3, clip_len=2,
                                height=32, width=56)


@pytest.mark.slow
def test_inference_session_export_roundtrip(rng, tmp_path):
    """jax.export deployment artifact: serialized StableHLO + weights
    restore to the identical servable without model-code retracing —
    incl. the int8-PTQ config."""
    for quantize in (False, True):
        sess = InferenceSession.create(batch=1, clip_len=2, height=32,
                                       width=56, quantize=quantize)
        clips = rng.integers(0, 256, (1, 2, 32, 56, 3)).astype(np.uint8)
        want = sess.predict(clips.copy())
        path = str(tmp_path / f"exp{int(quantize)}")
        sess.export(path)
        restored = InferenceSession.load_exported(path)
        got = restored.predict(clips)
        for k in want:
            np.testing.assert_allclose(got[k], want[k], atol=1e-6)
        with pytest.raises(ValueError):
            restored.export(path)  # restored sessions are not re-exportable


@pytest.mark.slow
def test_streaming_export_roundtrip(rng):
    """StreamingSession export: the restored servable reproduces the
    original's push trajectory from a fresh buffer."""
    import tempfile

    import jax.numpy as jnp

    from computervision_codes_tpu.serving import StreamingSession

    kw = dict(context=16, height=32, width=56, num_layers_pg=2,
              num_layers_r=2, num_refinements=1, num_f_maps=8,
              dtype=jnp.float32)
    sess = StreamingSession.create(**kw)
    frames = (rng.random((4, 32, 56, 3)) * 255).astype(np.uint8)
    want = [sess.push(f)["ivt"] for f in frames]
    path = tempfile.mkdtemp(prefix="stream_exp_")
    sess.export(path)
    restored = StreamingSession.load_exported(path)
    assert restored.receptive_field == sess.receptive_field
    got = [restored.push(f)["ivt"] for f in frames]
    for w, g in zip(want, got):
        np.testing.assert_allclose(g, w, atol=1e-6)
    with pytest.raises(ValueError):
        restored.export(path)
