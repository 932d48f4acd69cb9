"""Int8 PTQ student path (ops/quant.py + models/quantized.py).

Accuracy guards: primitive round-trips, conv+BN fold parity at fp32 vs the
float ResNet, pooled-feature fidelity on random weights, and logits
correlation through the full int8 e2e recognizer.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from computervision_codes_tpu.models.pipeline import EndToEndRecognizer
from computervision_codes_tpu.models.quantized import (
    make_int8_e2e,
    quantize_resnet,
    quantized_resnet_apply,
)
from computervision_codes_tpu.models.resnet import VARIANTS, build_resnet
from computervision_codes_tpu.ops.quant import (
    conv_i8,
    quantize_activation,
    quantize_weight,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_weight_quant_roundtrip(rng):
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)) * 0.1, jnp.float32)
    q, scale = quantize_weight(w)
    assert q.dtype == jnp.int8 and scale.shape == (16,)
    back = q.astype(jnp.float32) * scale[None, None, None, :]
    # per-channel absmax symmetric: error bounded by scale/2 per element
    err = np.asarray(jnp.abs(back - w))
    bound = np.asarray(scale)[None, None, None, :] * 0.5 + 1e-7
    assert (err <= bound).all()


def test_activation_quant_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((4, 5, 6, 7)) * 3, jnp.float32)
    q, s = quantize_activation(x)
    back = q.astype(jnp.float32) * s
    assert float(jnp.max(jnp.abs(back - x))) <= float(s) * 0.5 + 1e-6


def test_int8_conv_matches_exact_integer_math(rng):
    xq = jnp.asarray(rng.integers(-127, 128, (2, 8, 8, 4)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 128, (3, 3, 4, 6)), jnp.int8)
    got = conv_i8(xq, wq, padding=((1, 1), (1, 1)))
    want = jax.lax.conv_general_dilated(
        xq.astype(jnp.int32), wq.astype(jnp.int32), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def _float_and_quant(rng, network="resnet18", hw=(32, 56), batch=4):
    model = build_resnet(network, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((batch, *hw, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    # make BN stats non-trivial (fresh init has mean 0 var 1 = identity)
    variables = jax.tree.map(lambda v: v, variables)
    ref = model.apply(variables, x, train=False)
    qp = quantize_resnet(variables["params"], variables["batch_stats"])
    sizes, block_cls = VARIANTS[network]
    from computervision_codes_tpu.models.resnet import BasicBlock

    block = "basic" if block_cls is BasicBlock else "bottleneck"
    got = quantized_resnet_apply(qp, x, sizes, block=block,
                                 dtype=jnp.float32)
    return ref, got


def test_quantized_resnet18_feature_fidelity(rng):
    ref, got = _float_and_quant(rng, "resnet18")
    a = np.asarray(ref["pooled"], np.float64).ravel()
    b = np.asarray(got["pooled"], np.float64).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert cos > 0.99, cos
    assert rel < 0.15, rel
    # stage shapes preserved
    for r, g in zip(ref["stages"], got["stages"]):
        assert r.shape == g.shape


@pytest.mark.slow
def test_quantized_resnet50_runs(rng):
    ref, got = _float_and_quant(rng, "resnet50", hw=(32, 32), batch=2)
    assert got["pooled"].shape == ref["pooled"].shape
    assert np.isfinite(np.asarray(got["pooled"])).all()


@pytest.mark.slow
def test_int8_e2e_logits_track_float(rng):
    model = EndToEndRecognizer(dtype=jnp.float32)
    clips = jnp.asarray(rng.standard_normal((1, 8, 32, 56, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), clips)
    ref = model.apply(variables, clips)
    fn, qvars = make_int8_e2e(model, variables)
    got = jax.jit(fn)(qvars, clips)
    assert got["ivt"].shape == ref["ivt"].shape
    a = np.asarray(ref["ivt"], np.float64).ravel()
    b = np.asarray(got["ivt"], np.float64).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.98, corr


def test_int8_static_scales_track_dynamic(rng):
    """Calibrated static scales (the fast serving path, 1.25x on-chip)
    stay close to the dynamic-scale output on data like the calibration
    batch."""
    model = EndToEndRecognizer(dtype=jnp.float32)
    clips = jnp.asarray(rng.standard_normal((1, 8, 32, 56, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), clips)
    fn_d, qv_d = make_int8_e2e(model, variables)
    dyn = jax.jit(fn_d)(qv_d, clips)
    fn_s, qv_s = make_int8_e2e(model, variables, calibrate_clips=clips)
    # the stem ships as a BN-folded FLOAT conv (int8 is slower there);
    # every int8 conv now carries a baked scalar scale
    assert "w" in qv_s["q_backbone"]["conv1"]
    assert "act_scale" in qv_s["q_backbone"]["layer1_0"]["conv1"]
    sta = jax.jit(fn_s)(qv_s, clips)
    a = np.asarray(dyn["ivt"], np.float64).ravel()
    b = np.asarray(sta["ivt"], np.float64).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.995, corr
    # and against float too
    ref = model.apply(variables, clips)
    corr_f = np.corrcoef(np.asarray(ref["ivt"], np.float64).ravel(), b)[0, 1]
    assert corr_f > 0.98, corr_f


@pytest.mark.slow
def test_int8_tresnet_pooled_parity(rng):
    """quantize_tresnet + quantized_tresnet_apply track the float TResNet
    (pooled cosine > 0.99, dynamic AND calibrated static scales) — the
    round-3 int8 zoo extension (per-conv gains 1.1-4.0x on-chip,
    scripts/stem_probe.py)."""
    import jax
    import jax.numpy as jnp

    from computervision_codes_tpu.models.quant_tresnet import (
        calibrate_tresnet,
        quantize_tresnet,
        quantized_tresnet_apply,
    )
    from computervision_codes_tpu.models.tresnet import (VARIANTS,
                                                         build_tresnet)

    m = build_tresnet("tresnet_m", dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    v = m.init(jax.random.PRNGKey(1), x)
    want = m.apply(v, x)["pooled"]
    cfg = VARIANTS["tresnet_m"]
    qp = quantize_tresnet(v["params"], v["batch_stats"])
    for tree in (qp, calibrate_tresnet(qp, x, cfg["width"], cfg["layers"],
                                       dtype=jnp.float32)):
        got = quantized_tresnet_apply(tree, x, cfg["width"], cfg["layers"],
                                      dtype=jnp.float32)["pooled"]
        cos = float(jnp.sum(want * got)
                    / (jnp.linalg.norm(want) * jnp.linalg.norm(got)))
        assert cos > 0.99, cos


def test_int8_s2d_stem_tracks_float(rng):
    """The s2d stem execution plan in the int8 e2e path: float-model
    fidelity is preserved (the two int8 plans differ bit-wise — a stem
    reorder flips activation rounding bins that cascade — so the guard is
    correlation to FLOAT, like the main int8 guard, not int8-vs-int8)."""
    import jax

    from computervision_codes_tpu.models.pipeline import EndToEndRecognizer
    from computervision_codes_tpu.models.quantized import make_int8_e2e

    model = EndToEndRecognizer(num_layers_pg=3, num_layers_r=2,
                               num_refinements=1, num_f_maps=8,
                               dtype=jnp.float32)
    clips = jnp.asarray(rng.standard_normal((1, 4, 32, 56, 3)), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), clips)
    want = np.asarray(model.apply(v, clips)["ivt"]).ravel()
    fn, q = make_int8_e2e(model, v, calibrate_clips=clips, s2d_stem=True)
    got = np.asarray(fn(q, clips)["ivt"]).ravel()
    assert np.corrcoef(got, want)[0, 1] > 0.995
