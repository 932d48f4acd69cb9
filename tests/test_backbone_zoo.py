import jax
import jax.numpy as jnp
import numpy as np

from computervision_codes_tpu.models.cvt import build_cvt
from computervision_codes_tpu.models.tresnet import build_tresnet, TResNet


def test_tresnet_m_shapes(rng):
    model = TResNet(width=16, layers=(1, 1, 1, 1))
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    # stem /4 (space-to-depth), stages 2-4 stride 2 -> /32 total
    assert out["stages"][0].shape[1:3] == (16, 16)
    assert out["stages"][3].shape[1:3] == (2, 2)
    # stages 1-2 basic (C=width*2^si), stages 3-4 bottleneck (x4)
    assert out["stages"][0].shape[-1] == 16
    assert out["stages"][1].shape[-1] == 32
    assert out["stages"][2].shape[-1] == 64 * 4
    assert out["pooled"].shape == (1, 128 * 4)
    assert bool(jnp.isfinite(out["pooled"]).all())


def test_tresnet_train_updates_bn(rng):
    model = TResNet(width=16, layers=(1, 1, 1, 1))
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out, mutated = model.apply(variables, x, train=True,
                               mutable=["batch_stats"])
    before = variables["batch_stats"]["stem_abn"]["bn"]["mean"]
    after = mutated["batch_stats"]["stem_abn"]["bn"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_tresnet_variants_exist():
    for name in ("tresnet_m", "tresnet_l", "tresnet_xl"):
        m = build_tresnet(name)
        assert m.layers is not None


def test_cvt_shapes(rng):
    model = build_cvt("cvt_nano")
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    # /4 then /2 then /2 = /16
    assert out["feature_map"].shape == (1, 4, 4, 64)
    assert out["pooled"].shape == (1, 64)  # cls token
    assert bool(jnp.isfinite(out["pooled"]).all())
