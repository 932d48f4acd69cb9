import jax
import jax.numpy as jnp
import numpy as np
import pytest

from computervision_codes_tpu.models.mstct import MSTCT
from computervision_codes_tpu.models.resnet import build_resnet, feature_dim
from computervision_codes_tpu.models.spatial_cnn import SpatialCNN
from computervision_codes_tpu.models.tcn import TemporalTCN


def test_resnet18_shapes(rng):
    model = build_resnet("resnet18")
    x = jnp.asarray(rng.standard_normal((2, 64, 112, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert [s.shape[-1] for s in out["stages"]] == [64, 128, 256, 512]
    # strides: /4 stem, then /2 per stage after the first
    assert out["stages"][0].shape[1:3] == (16, 28)
    assert out["stages"][3].shape[1:3] == (2, 4)
    assert out["pooled"].shape == (2, 512)
    assert feature_dim("resnet18") == 512 and feature_dim("resnet50") == 2048


def test_resnet_batchstats_update(rng):
    model = build_resnet("resnet18")
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    _, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = variables["batch_stats"]["bn1"]["mean"]
    after = mutated["batch_stats"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_spatial_cnn_student(rng):
    model = SpatialCNN(network="resnet18", loss_type="all", teacher_dim=96)
    img = jnp.asarray(rng.standard_normal((2, 64, 112, 3)), jnp.float32)
    fi = jnp.asarray(rng.standard_normal((2, 96)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, fi, fi, fi, train=False)
    out = model.apply(variables, img, fi, fi, fi, train=False)
    assert out["logits"]["i"].shape == (2, 6)
    assert out["logits"]["v"].shape == (2, 10)
    assert out["logits"]["t"].shape == (2, 15)
    assert out["logits"]["ivt"].shape == (2, 100)
    assert out["feature"].shape == (2, 512)
    assert out["kd"]["i"].shape == (2, 96)

    # eval path without teachers
    out2 = model.apply(variables, img)
    assert "kd" not in out2 and out2["logits"]["ivt"].shape == (2, 100)


def test_spatial_cnn_jit_compiles(rng):
    model = SpatialCNN(network="resnet18", loss_type="ivt")
    img = jnp.zeros((1, 32, 56, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img)

    @jax.jit
    def fwd(v, x):
        return model.apply(v, x)["logits"]["ivt"]

    assert fwd(variables, img).shape == (1, 100)


def test_tcn_shapes_and_mask(rng):
    model = TemporalTCN(num_layers_pg=4, num_layers_r=3, num_refinements=3,
                        num_f_maps=32, num_classes=100)
    x = jnp.asarray(rng.standard_normal((1, 40, 16)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert len(out["ivt"]) == 4  # 4 pyramid levels
    for lvl in out["ivt"]:
        assert lvl.shape == (1, 40, 100)
    assert out["i"][0].shape == (1, 40, 6)
    assert out["v"][0].shape == (1, 40, 10)
    assert out["t"][0].shape == (1, 40, 15)

    # train with masking consumes a dropout rng and still produces shapes
    out_m = model.apply(variables, x, train=True, apply_mask=True,
                        rngs={"dropout": jax.random.PRNGKey(1)})
    assert out_m["ivt"][0].shape == (1, 40, 100)


def test_tcn_causal_variant_is_causal(rng):
    model = TemporalTCN(num_layers_pg=3, num_layers_r=2, num_refinements=1,
                        num_f_maps=16, num_classes=4, causal=True,
                        use_fpn=False, channel_dropout=0.0)
    x = np.asarray(rng.standard_normal((1, 30, 8)), np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    base = np.asarray(model.apply(variables, jnp.asarray(x))["ivt"][0])
    x2 = x.copy()
    x2[0, 20:] += 10.0  # perturb the future
    pert = np.asarray(model.apply(variables, jnp.asarray(x2))["ivt"][0])
    np.testing.assert_allclose(base[0, :20], pert[0, :20], atol=1e-5)
    assert not np.allclose(base[0, 20:], pert[0, 20:])


def test_mstct_shapes(rng):
    model = MSTCT(embed_dims=(16, 24, 32, 48), num_blocks=1, num_heads=4,
                  mlp_ratio=2.0, final_embedding_dim=24, num_classes=6)
    x = jnp.asarray(rng.standard_normal((2, 64, 20)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out["logits"].shape == (2, 64, 6)
    assert out["feature"].shape == (2, 64, 24)
    assert out["concat_feature"].shape == (2, 64, 96)


def test_mstct_train_dropout(rng):
    model = MSTCT(embed_dims=(8, 8, 8, 8), num_blocks=1, num_heads=2,
                  mlp_ratio=1.0, final_embedding_dim=8, num_classes=3)
    x = jnp.ones((1, 16, 4), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    a = model.apply(variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    b = model.apply(variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(a["logits"]), np.asarray(b["logits"]))


def test_tcn_hier_pyramid(rng):
    from computervision_codes_tpu.models.tcn import TemporalTCN

    model = TemporalTCN(num_layers_pg=2, num_layers_r=2, num_refinements=3,
                        num_f_maps=8, num_classes=4, hier=True,
                        channel_dropout=0.0)
    x = jnp.asarray(rng.standard_normal((1, 100, 8)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    lengths = [l.shape[1] for l in out["ivt"]]
    # FPN upsamples everything back to each level's own length; levels
    # shrink by the (k7, s3) pooling between refinements
    assert lengths[0] == 100 and lengths[1] < 100 and lengths[3] < lengths[2]


def test_resnet_s2d_stem_equivalent(rng):
    """The space-to-depth conv1 execution plan (models/resnet._s2d_conv1)
    is the SAME function on the SAME params as the 7x7/2 stem — and falls
    back to the plain conv on odd spatial sizes."""
    import jax

    from computervision_codes_tpu.models.resnet import build_resnet

    base = build_resnet("resnet18")
    s2d = build_resnet("resnet18", s2d_stem=True)
    x = jnp.asarray(rng.standard_normal((2, 32, 56, 3)), jnp.float32)
    v = base.init(jax.random.PRNGKey(0), x)
    want = base.apply(v, x, mutable=False)["pooled"]
    got = s2d.apply(v, x, mutable=False)["pooled"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    xo = jnp.asarray(rng.standard_normal((1, 31, 55, 3)), jnp.float32)
    want_o = base.apply(v, xo, mutable=False)["pooled"]
    got_o = s2d.apply(v, xo, mutable=False)["pooled"]  # fallback path
    np.testing.assert_allclose(np.asarray(got_o), np.asarray(want_o),
                               atol=2e-5)


def test_resnet_fused_stem_eval_matches(rng):
    """ResNet(fused_stem=True) eval == the standard stem (BN folded at
    trace time into the ops/stem_pool kernel); train path unaffected."""
    import jax

    from computervision_codes_tpu.models.resnet import build_resnet

    base = build_resnet("resnet18")
    fused = build_resnet("resnet18", fused_stem=True)
    x = jnp.asarray(rng.standard_normal((2, 32, 56, 3)), jnp.float32)
    v = base.init(jax.random.PRNGKey(0), x)
    # non-trivial BN stats
    v = jax.tree_util.tree_map_with_path(
        lambda p, a: a + 0.3 if any(getattr(k, "key", "") == "mean"
                                    for k in p) else a, v)
    want = base.apply(v, x, mutable=False)["pooled"]
    got = fused.apply(v, x, mutable=False)["pooled"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)
