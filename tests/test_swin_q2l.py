import jax
import jax.numpy as jnp
import numpy as np
import pytest

from computervision_codes_tpu.models.position_encoding import sine_position_embedding
from computervision_codes_tpu.models.q2l import Q2L, Q2LTransformer
from computervision_codes_tpu.models.swin import (
    SwinTransformer,
    _relative_position_index,
    _shift_attn_mask,
    window_partition,
    window_reverse,
)


def test_window_partition_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 5)), jnp.float32)
    w = 4
    win = window_partition(x, w)
    assert win.shape == (2 * 2 * 3, 16, 5)
    back = window_reverse(win, w, 8, 12)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_relative_position_index_properties():
    idx = _relative_position_index(7)
    assert idx.shape == (49, 49)
    assert idx.min() >= 0 and idx.max() < 13 * 13
    # diagonal is the center bias (same relative offset everywhere)
    assert len(set(idx[np.arange(49), np.arange(49)])) == 1


def test_shift_mask_blocks_cross_region():
    m = _shift_attn_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    assert set(np.unique(m)) <= {0.0, -100.0}
    assert (m == -100.0).any()


def test_tiny_swin_shapes(rng):
    model = SwinTransformer(embed_dim=16, depths=(1, 1, 1, 1),
                            num_heads=(1, 2, 4, 8), window_size=4,
                            num_classes=5)
    x = jnp.asarray(rng.standard_normal((2, 64, 96, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    # /32 total downsampling, final dim = 16 * 8
    assert out["feature_map"].shape == (2, 2, 3, 128)
    assert out["pooled"].shape == (2, 128)
    assert out["logits"].shape == (2, 5)


def test_swin_nondivisible_window(rng):
    # 256x448 -> stage 0 at 64x112 with window 7 needs padding
    model = SwinTransformer(embed_dim=8, depths=(1, 1), num_heads=(1, 2),
                            window_size=7)
    x = jnp.asarray(rng.standard_normal((1, 64, 112, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out["feature_map"].shape == (1, 8, 14, 16)
    assert bool(jnp.isfinite(out["feature_map"]).all())


def test_sine_position_embedding_shape():
    pos = sine_position_embedding(8, 14, 64)
    assert pos.shape == (8, 14, 128)
    assert np.isfinite(pos).all()
    assert np.abs(pos).max() <= 1.0 + 1e-6


def test_q2l_transformer(rng):
    tr = Q2LTransformer(dim=32, ffn_dim=64)
    src = jnp.asarray(rng.standard_normal((2, 12, 32)), jnp.float32)
    pos = jnp.asarray(rng.standard_normal((1, 12, 32)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((6, 32)), jnp.float32)
    variables = tr.init(jax.random.PRNGKey(0), src, pos, q)
    hs, mem = tr.apply(variables, src, pos, q)
    assert hs.shape == (2, 6, 32)
    assert mem.shape == (2, 12, 32)


@pytest.mark.parametrize("loss_type", [
    pytest.param("i", marks=pytest.mark.slow),  # 115s; [all] covers more
    "all",
])
def test_q2l_full_model(rng, loss_type):
    model = Q2L(backbone="swin_T_224_1k", loss_type=loss_type, teacher_dim=24)
    # tiny images: swin T window 7, 64x64 -> final 2x2 map
    img = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    tf = jnp.asarray(rng.standard_normal((1, 24)), jnp.float32)
    args = (img, tf, tf, tf) if loss_type == "all" else (img,)
    variables = model.init(jax.random.PRNGKey(0), *args)
    out = model.apply(variables, *args)
    assert out["logits"]["i"].shape == (1, 6)
    assert out["feature"].shape == (1, 768)
    if loss_type == "all":
        assert out["logits"]["ivt"].shape == (1, 100)
        assert out["kd"]["i"].shape == (1, 24)
        # transformer weights shared across tasks: only ONE transformer param set
        assert "transformer" in variables["params"]
    else:
        assert float(jnp.sum(jnp.abs(out["logits"]["ivt"]))) == 0.0


@pytest.mark.slow
def test_swin_remat_grad_matches(rng):
    """remat=True must give identical outputs and gradients (just cheaper
    memory) — validates the jax.checkpoint wiring."""
    kw = dict(embed_dim=8, depths=(1, 1), num_heads=(1, 2), window_size=4,
              drop_path_rate=0.0)
    a = SwinTransformer(**kw, remat=False)
    b = SwinTransformer(**kw, remat=True)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    va = a.init(jax.random.PRNGKey(0), x)

    def loss(model, v):
        return jnp.sum(model.apply(v, x)["pooled"] ** 2)

    la, ga = jax.value_and_grad(lambda v: loss(a, v))(va)
    lb, gb = jax.value_and_grad(lambda v: loss(b, v))(va)
    np.testing.assert_allclose(float(la), float(lb), rtol=1e-6)
    for pa, pb in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb), atol=1e-5)


def test_q2l_sim_mat_surface(rng):
    """The reference TERL transformer variant threads the last decoder
    layer's cross-attention weights out as sim_mat_2
    (TERL/6_baseline_learnT/models/moco.py:67-77,
    models/transformer.py:161-178): head-averaged (B, K, HW) rows summing
    to 1, same params as the plain forward."""
    tr = Q2LTransformer(dim=32, ffn_dim=64)
    src = jnp.asarray(rng.standard_normal((2, 12, 32)), jnp.float32)
    pos = jnp.asarray(rng.standard_normal((1, 12, 32)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((6, 32)), jnp.float32)
    variables = tr.init(jax.random.PRNGKey(0), src, pos, q)
    hs, mem, sim = tr.apply(variables, src, pos, q, return_attn=True)
    assert sim.shape == (2, 6, 12)
    np.testing.assert_allclose(np.asarray(sim.sum(-1)), 1.0, atol=1e-5)
    # the attention tap must not change the decoded output
    hs_plain, _ = tr.apply(variables, src, pos, q)
    np.testing.assert_allclose(np.asarray(hs), np.asarray(hs_plain),
                               atol=1e-6)

    model = Q2L(backbone="swin_nano_64", loss_type="i", teacher_dim=24,
                return_sim_mat=True)
    img = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)
    out = model.apply(variables, img)
    assert set(out["sim_mat"]) == {"i"}
    b, k, hw = out["sim_mat"]["i"].shape
    assert (b, k) == (1, 6)
    np.testing.assert_allclose(np.asarray(out["sim_mat"]["i"].sum(-1)), 1.0,
                               atol=1e-5)


def test_swin_s2d_embed_exact(rng):
    """The patch embed's 4x4/s4 conv == a GEMM over the block-4
    space-to-depth view (stride == kernel, same params): exact."""
    kw = dict(embed_dim=32, depths=(2,), num_heads=(2,), window_size=4,
              num_classes=0)
    img = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    base = SwinTransformer(**kw)
    v = base.init(jax.random.PRNGKey(0), img)
    want = base.apply(v, img)["pooled"]
    got = SwinTransformer(s2d_embed=True, **kw).apply(v, img)["pooled"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
