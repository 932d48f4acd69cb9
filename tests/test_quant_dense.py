"""Int8 interception of nn.Dense (models/quant_dense.py) on a small Swin."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from computervision_codes_tpu.models.quant_dense import (
    collect_dense_scales,
    int8_apply,
    quantize_dense_params,
)
from computervision_codes_tpu.models.swin import VARIANTS, SwinTransformer


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_int8_swin_tracks_float(rng):
    model = SwinTransformer(dtype=jnp.float32, **VARIANTS["swin_nano_64"])
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    ref = model.apply(variables, x)["pooled"]

    scales = collect_dense_scales(model, variables, x)
    qd = quantize_dense_params(variables)
    assert len(scales) > 10  # qkv/proj/mlp across blocks all intercepted
    assert set(scales) <= set(qd)

    got = jax.jit(
        lambda v, q, x: int8_apply(model, v, q, scales, x)["pooled"]
    )(variables, qd, x)
    a = np.asarray(ref, np.float64).ravel()
    b = np.asarray(got, np.float64).ravel()
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.99, cos
    assert not np.allclose(a, b)  # actually quantized, not a fallthrough


def test_int8_apply_falls_through_uncalibrated(rng):
    model = SwinTransformer(dtype=jnp.float32, **VARIANTS["swin_nano_64"])
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    ref = model.apply(variables, x)["pooled"]
    qd = quantize_dense_params(variables)
    got = int8_apply(model, variables, qd, {}, x)["pooled"]  # no scales
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)
