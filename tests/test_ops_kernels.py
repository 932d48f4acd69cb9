import jax
import jax.numpy as jnp
import numpy as np
import pytest

from computervision_codes_tpu.ops.dilated_conv import (
    dilated_residual_fused,
    dilated_residual_pallas,
    dilated_residual_reference,
)
from computervision_codes_tpu.ops.fused_norm import (
    blur_pool,
    fused_scale_bias_act,
    fused_scale_bias_act_reference,
    space_to_depth,
)


def _layer(rng, b=1, t=70, c=16):
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    w_taps = jnp.asarray(rng.standard_normal((3, c, c)) * 0.1, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((c, c)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    return x, w_taps, b1, w2, b2


@pytest.mark.parametrize("dilation", [1, 4, 16])
def test_dilated_residual_pallas_matches_reference(rng, dilation):
    x, w_taps, b1, w2, b2 = _layer(rng)
    want = dilated_residual_reference(x, w_taps, b1, w2, b2, dilation)
    got = dilated_residual_pallas(x, w_taps, b1, w2, b2, dilation, block_t=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


@pytest.mark.parametrize("dilation", [1, 4, 16])
def test_dilated_residual_pallas_causal(rng, dilation):
    """Causal variant: taps (t-2d, t-d, t), front-zero-padded — the
    streaming/online TCN path (serving.StreamingSession)."""
    x, w_taps, b1, w2, b2 = _layer(rng)
    want = dilated_residual_reference(x, w_taps, b1, w2, b2, dilation,
                                      causal=True)
    got = dilated_residual_pallas(x, w_taps, b1, w2, b2, dilation,
                                  block_t=32, causal=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)
    # causality: future frames cannot change past outputs
    x2 = x.at[:, -1].add(100.0)
    got2 = dilated_residual_pallas(x2, w_taps, b1, w2, b2, dilation,
                                   block_t=32, causal=True)
    np.testing.assert_array_equal(np.asarray(got2[:, :-1]),
                                  np.asarray(got[:, :-1]))


def test_dilated_residual_reference_matches_torch_conv(rng):
    import torch

    x, w_taps, b1, w2, b2 = _layer(rng, t=40, c=8)
    d = 3
    conv = torch.nn.Conv1d(8, 8, 3, padding=d, dilation=d)
    with torch.no_grad():
        # torch conv1d weight (out, in, k): k taps [left, center, right]
        conv.weight.copy_(torch.tensor(
            np.stack([np.asarray(w_taps[k]).T for k in range(3)], axis=-1)))
        conv.bias.copy_(torch.tensor(np.asarray(b1)))
    proj = torch.nn.Conv1d(8, 8, 1)
    with torch.no_grad():
        proj.weight.copy_(torch.tensor(np.asarray(w2).T[:, :, None]))
        proj.bias.copy_(torch.tensor(np.asarray(b2)))
    xt = torch.tensor(np.asarray(x).transpose(0, 2, 1))
    with torch.no_grad():
        want = (xt + proj(torch.relu(conv(xt)))).numpy().transpose(0, 2, 1)
    got = dilated_residual_reference(x, w_taps, b1, w2, b2, d)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


def test_dilated_residual_fused_grad(rng):
    x, w_taps, b1, w2, b2 = _layer(rng, t=20, c=8)

    def loss(x, w_taps):
        return jnp.sum(dilated_residual_fused(x, w_taps, b1, w2, b2, 2) ** 2)

    g1, g2 = jax.grad(loss, argnums=(0, 1))(x, w_taps)
    ref = jax.grad(
        lambda x, w: jnp.sum(
            dilated_residual_reference(x, w, b1, w2, b2, 2) ** 2),
        argnums=(0, 1))(x, w_taps)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(ref[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(ref[1]), atol=1e-4)


def test_fused_scale_bias_act(rng):
    x = jnp.asarray(rng.standard_normal((4, 10, 16)), jnp.float32)
    s = jnp.asarray(rng.standard_normal(16), jnp.float32)
    b = jnp.asarray(rng.standard_normal(16), jnp.float32)
    want = fused_scale_bias_act_reference(x, s, b)
    got = fused_scale_bias_act(x, s, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def test_space_to_depth_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 3)), jnp.float32)
    y = space_to_depth(x, 4)
    assert y.shape == (1, 2, 2, 48)
    # first output channel block = the 4x4 patch of channel order
    np.testing.assert_allclose(np.asarray(y[0, 0, 0, :3]),
                               np.asarray(x[0, 0, 0]), rtol=1e-6)


def test_blur_pool_shape_and_smoothing(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    y = blur_pool(x)
    assert y.shape == (1, 4, 4, 4)
    # constant input stays constant in the interior (filter sums to 1)
    const = jnp.ones((1, 8, 8, 2))
    yc = blur_pool(const)
    np.testing.assert_allclose(np.asarray(yc[0, 1:3, 1:3]), 1.0, rtol=1e-6)


def test_window_attention_pallas_matches_reference(rng):
    from computervision_codes_tpu.ops.window_attention import (
        window_attention_pallas,
        window_attention_reference,
    )

    bw, h, n, d = 6, 3, 49, 32
    nw = 3
    q = jnp.asarray(rng.standard_normal((bw, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bw, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bw, h, n, d)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((h, n, n)) * 0.1, jnp.float32)
    mask = jnp.asarray(
        np.where(rng.random((nw, n, n)) < 0.2, -100.0, 0.0), jnp.float32)
    want = window_attention_reference(q, k, v, bias, mask, nw=nw)
    got = window_attention_pallas(q, k, v, bias, mask, nw=nw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    # no-mask path
    want2 = window_attention_reference(q, k, v, bias)
    got2 = window_attention_pallas(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), atol=2e-5)


def test_window_attention_fused_grad(rng):
    from computervision_codes_tpu.ops.window_attention import (
        window_attention_fused,
        window_attention_reference,
    )

    bw, h, n, d = 2, 2, 16, 8
    q = jnp.asarray(rng.standard_normal((bw, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bw, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bw, h, n, d)), jnp.float32)
    bias = jnp.zeros((h, n, n), jnp.float32)
    mask = jnp.zeros((1, n, n), jnp.float32)

    g = jax.grad(lambda q: jnp.sum(
        window_attention_fused(q, k, v, bias, mask, 1) ** 2))(q)
    want = jax.grad(lambda q: jnp.sum(
        window_attention_reference(q, k, v, bias, mask, nw=1) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(want), atol=1e-4)


def test_multi_window_attention_matches_reference(rng):
    from computervision_codes_tpu.ops.window_attention import (
        window_attention_pallas_multi,
        window_attention_reference,
    )

    bw, h, n, d = 24, 3, 49, 32
    nw = 4
    q = jnp.asarray(rng.standard_normal((bw, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((bw, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((bw, h, n, d)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((h, n, n)) * 0.1, jnp.float32)
    mask = jnp.asarray(
        np.where(rng.random((nw, n, n)) < 0.2, -100.0, 0.0), jnp.float32)
    want = window_attention_reference(q, k, v, bias, mask, nw=nw)
    # g < nw (mask slice), g == nw, g > nw (mask tile), g = full batch
    for g in (2, 4, 8, 24):
        got = window_attention_pallas_multi(q, k, v, bias, mask, nw=nw,
                                            block_windows=g)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)
    # no-mask path
    want = window_attention_reference(q, k, v, bias, None)
    got = window_attention_pallas_multi(q, k, v, bias, None, block_windows=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_window_mhsa_fused_matches_reference(rng):
    """Fused LN+QKV+attn+proj+residual half-block (ops/window_mhsa) vs the
    XLA reference, with and without the shift mask, multi-row grid steps."""
    import jax
    import jax.numpy as jnp

    from computervision_codes_tpu.models.swin import _shift_attn_mask
    from computervision_codes_tpu.ops.window_mhsa import (
        window_mhsa_fused,
        window_mhsa_reference,
    )

    b, hw, c, heads, w = 2, 16, 64, 2, 4
    x = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.float32)
    gamma = jnp.asarray(1 + 0.1 * rng.standard_normal(c), jnp.float32)
    beta = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.1, jnp.float32)
    bqkv = jnp.asarray(rng.standard_normal(3 * c) * 0.01, jnp.float32)
    wproj = jnp.asarray(rng.standard_normal((c, c)) * 0.1, jnp.float32)
    bproj = jnp.asarray(rng.standard_normal(c) * 0.01, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, 16, 16)) * 0.1,
                       jnp.float32)
    for mask in (None, jnp.asarray(_shift_attn_mask(hw, hw, w, 2))):
        want = window_mhsa_reference(x, gamma, beta, wqkv, bqkv, wproj,
                                     bproj, bias, mask, window=w,
                                     num_heads=heads)
        for r in (1, 2):
            got = window_mhsa_fused(x, gamma, beta, wqkv, bqkv, wproj,
                                    bproj, bias, mask, window=w,
                                    num_heads=heads, rows_per_step=r)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-5)


def test_swin_block_fused_matches_reference(rng):
    """Merged single-kernel Swin block (ops/swin_block: attn + MLP halves,
    attention parked in VMEM scratch across the hidden-chunk grid axis)
    vs the chained XLA references, with/without shift mask and chunking."""
    import jax.numpy as jnp

    from computervision_codes_tpu.models.swin import _shift_attn_mask
    from computervision_codes_tpu.ops.swin_block import (
        swin_block_fused,
        swin_block_reference,
    )

    b, hw, c, heads, w = 2, 8, 32, 4, 4
    f = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
    x = f(b, hw, hw, c)
    attn = (f(c) + 1, f(c), f(c, 3 * c), f(3 * c), f(c, c), f(c),
            f(heads, 16, 16))
    mlp = (f(c) + 1, f(c), f(c, 4 * c), f(4 * c), f(4 * c, c), f(c))
    for mask in (None, jnp.asarray(_shift_attn_mask(hw, hw, w, 2))):
        want = swin_block_reference(x, *attn, mask, *mlp, window=w,
                                    num_heads=heads)
        for hc in (0, 64):
            got = swin_block_fused(x, *attn, mask, *mlp, window=w,
                                   num_heads=heads, hidden_chunk=hc)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-5)


def test_mlp_block_fused_matches_reference(rng):
    """Fused LN+mlp+residual half-block (ops/mlp_block) vs XLA, including
    the hidden-chunked accumulation path and the erf-GELU approximation."""
    import jax.numpy as jnp

    from computervision_codes_tpu.ops.mlp_block import (
        mlp_block_fused,
        mlp_block_reference,
    )

    t, c = 64, 32
    x = jnp.asarray(rng.standard_normal((2, t // 2, c)), jnp.float32)
    gamma = jnp.asarray(1 + 0.1 * rng.standard_normal(c), jnp.float32)
    beta = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, 4 * c)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(4 * c) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((4 * c, c)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(c) * 0.01, jnp.float32)
    want = mlp_block_reference(x, gamma, beta, w1, b1, w2, b2)
    # single-chunk and multi-chunk (accumulating) configurations
    for bt, hc in ((1024, 1024), (16, 32), (32, 64)):
        got = mlp_block_fused(x, gamma, beta, w1, b1, w2, b2,
                              block_tokens=bt, hidden_chunk=hc)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, err_msg=f"bt={bt} hc={hc}")


def test_mlp_block_fused_quant_matches_emulation(rng):
    """mlp_block_fused(quant=True) == a jnp emulation of the exact same
    int8 math (per-channel weight quant via q8_weight + one dynamic
    activation scale per token block), plus loose drift vs float."""
    import jax
    import jax.numpy as jnp

    from computervision_codes_tpu.ops.mlp_block import (
        _gelu_exact,
        mlp_block_fused,
        mlp_block_reference,
        q8_dot,
        q8_weight,
    )

    t, c = 64, 32
    x = jnp.asarray(rng.standard_normal((t, c)), jnp.float32)
    gamma = jnp.asarray(1 + 0.1 * rng.standard_normal(c), jnp.float32)
    beta = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, 4 * c)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(4 * c) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((4 * c, c)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(c) * 0.01, jnp.float32)

    got = mlp_block_fused(x, gamma, beta, w1, b1, w2, b2, quant=True)

    # emulation: t <= block_tokens, so ONE token block = one act scale
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    normed = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
    w1q, s1 = q8_weight(w1)
    w2q, s2 = q8_weight(w2)
    h = _gelu_exact(q8_dot(normed, w1q, s1) + b1)
    want = x + (q8_dot(h, w2q, s2) + b2).astype(x.dtype)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    # and the PTQ noise vs the float path stays small
    ref = mlp_block_reference(x, gamma, beta, w1, b1, w2, b2)
    drift = np.max(np.abs(np.asarray(got) - np.asarray(ref)))
    assert drift < 0.15, drift


def test_window_mhsa_fused_quant_drift(rng):
    """window_mhsa_fused(quant=True): int8 QKV/proj projections drift
    only PTQ-noise from the float reference; attention core unchanged."""
    import jax.numpy as jnp

    from computervision_codes_tpu.ops.window_mhsa import (
        window_mhsa_fused,
        window_mhsa_reference,
    )

    b, hw, c, heads, w = 2, 8, 32, 4, 4
    n = w * w
    f = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
    x = f(b, hw, hw, c)
    args = (f(c) + 1, f(c), f(c, 3 * c), f(3 * c), f(c, c), f(c),
            f(heads, n, n))
    want = window_mhsa_reference(x, *args, None, window=w, num_heads=heads)
    got = window_mhsa_fused(x, *args, None, window=w, num_heads=heads,
                            quant=True)
    drift = np.max(np.abs(np.asarray(got) - np.asarray(want)))
    assert drift < 0.05, drift


def test_swin_quant_eval_drift(rng):
    """SwinTransformer(quant_eval=True) end-to-end: same param tree, PTQ-
    grade drift on features (the int8 teacher serving config)."""
    import jax
    import jax.numpy as jnp

    from computervision_codes_tpu.models.swin import (SwinTransformer,
                                                      VARIANTS)

    cfg = VARIANTS["swin_nano_64"]
    m_x = SwinTransformer(fused_eval=False, dtype=jnp.float32, **cfg)
    m_q = SwinTransformer(fused_eval=True, fused_split=True,
                          quant_eval=True, quant_min_dim=0,
                          dtype=jnp.float32, **cfg)
    x = jnp.asarray(rng.standard_normal((1, 64, 64, 3)), jnp.float32)
    v = m_x.init(jax.random.PRNGKey(1), x)
    a = m_x.apply(v, x)
    b = m_q.apply(v, x)
    err = np.max(np.abs(np.asarray(a["pooled"]) - np.asarray(b["pooled"])))
    rel = err / (np.max(np.abs(np.asarray(a["pooled"]))) + 1e-9)
    assert rel < 0.15, (err, rel)


def test_swin_fused_eval_matches_xla_model(rng):
    """SwinTransformer(fused_eval=True) forward == the XLA path on the
    same params (the production TPU eval path, CPU interpret here)."""
    import jax
    import jax.numpy as jnp

    from computervision_codes_tpu.models.swin import (SwinTransformer,
                                                      VARIANTS)

    cfg = VARIANTS["swin_nano_64"]
    m_x = SwinTransformer(fused_eval=False, dtype=jnp.float32, **cfg)
    m_f = SwinTransformer(fused_eval=True, dtype=jnp.float32, **cfg)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    v = m_x.init(jax.random.PRNGKey(1), x)
    a = m_x.apply(v, x)
    b = m_f.apply(v, x)
    for k in ("feature_map", "pooled"):
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   atol=5e-5)


def test_swin_block_fused_quant_drift(rng):
    """Merged single-kernel Swin block with quant=True: int8 QKV/proj/MLP
    GEMMs drift only PTQ-noise from the float reference."""
    import jax.numpy as jnp

    from computervision_codes_tpu.models.swin import _shift_attn_mask
    from computervision_codes_tpu.ops.swin_block import (
        swin_block_fused,
        swin_block_reference,
    )

    b, hw, c, heads, w = 2, 8, 32, 4, 4
    f = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
    x = f(b, hw, hw, c)
    attn = (f(c) + 1, f(c), f(c, 3 * c), f(3 * c), f(c, c), f(c),
            f(heads, 16, 16))
    mlp = (f(c) + 1, f(c), f(c, 4 * c), f(4 * c), f(4 * c, c), f(c))
    mask = jnp.asarray(_shift_attn_mask(hw, hw, w, 2))
    want = swin_block_reference(x, *attn, mask, *mlp, window=w,
                                num_heads=heads)
    got = swin_block_fused(x, *attn, mask, *mlp, window=w, num_heads=heads,
                           quant=True)
    drift = np.max(np.abs(np.asarray(got) - np.asarray(want)))
    assert 0 < drift < 0.08, drift


def test_window_mhsa_rows_per_step(rng):
    """rows_per_step > 1 (multiple window-rows per grid step) matches the
    reference, shifted and not — the probe-only path, pinned on CPU."""
    import jax.numpy as jnp

    from computervision_codes_tpu.models.swin import _shift_attn_mask
    from computervision_codes_tpu.ops.window_mhsa import (
        window_mhsa_fused,
        window_mhsa_reference,
    )

    b, hw, c, heads, w = 1, 8, 32, 4, 4
    f = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
    x = f(b, hw, hw, c)
    args = (f(c) + 1, f(c), f(c, 3 * c), f(3 * c), f(c, c), f(c),
            f(heads, 16, 16))
    for mask in (None, jnp.asarray(_shift_attn_mask(hw, hw, w, 2))):
        want = window_mhsa_reference(x, *args, mask, window=w,
                                     num_heads=heads)
        got = window_mhsa_fused(x, *args, mask, window=w, num_heads=heads,
                                rows_per_step=2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)


def test_mlp_block_fused_quant_multi_block(rng):
    """Per-token-block dynamic activation scales: two token blocks get
    DIFFERENT scales and still match the per-block emulation."""
    import jax
    import jax.numpy as jnp

    from computervision_codes_tpu.ops.mlp_block import (
        _gelu_exact,
        mlp_block_fused,
        q8_dot,
        q8_weight,
    )

    t, c, blk = 32, 32, 16
    x = jnp.asarray(rng.standard_normal((t, c)), jnp.float32)
    x = x.at[blk:].multiply(10.0)  # force distinct per-block absmax
    gamma = jnp.asarray(1 + 0.1 * rng.standard_normal(c), jnp.float32)
    beta = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, 4 * c)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(4 * c) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((4 * c, c)) * 0.1, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(c) * 0.01, jnp.float32)

    got = mlp_block_fused(x, gamma, beta, w1, b1, w2, b2,
                          block_tokens=blk, hidden_chunk=4 * c, quant=True)
    # hidden_chunk = c: FOUR chunks — exercises the quant-specific scale
    # BlockSpec indexing and the int8 partial-sum accumulation across the
    # hidden grid axis (per-CHUNK activation scales for the second GEMM)
    got_chunked = mlp_block_fused(x, gamma, beta, w1, b1, w2, b2,
                                  block_tokens=blk, hidden_chunk=c,
                                  quant=True)

    w1q, s1 = q8_weight(w1)
    w2q, s2 = q8_weight(w2)
    outs, outs_chunked = [], []
    for i in range(t // blk):
        xb = x[i * blk:(i + 1) * blk]
        xf = xb.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        normed = (xf - mu) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
        h = _gelu_exact(q8_dot(normed, w1q, s1) + b1)
        outs.append(xb + (q8_dot(h, w2q, s2) + b2).astype(xb.dtype))
        acc = xb + b2.astype(xb.dtype)
        for j in range(4):
            sl = slice(j * c, (j + 1) * c)
            hj = _gelu_exact(q8_dot(normed, w1q[:, sl], s1[:, sl]) + b1[sl])
            acc = acc + q8_dot(hj, w2q[sl, :], s2).astype(xb.dtype)
        outs_chunked.append(acc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(
        jnp.concatenate(outs)), atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_chunked), np.asarray(
        jnp.concatenate(outs_chunked)), atol=1e-4)


@pytest.mark.slow
def test_swin_fused_train_grad_matches_xla(rng):
    """SwinTransformer(fused_train=True): the Pallas-forward /
    reference-backward training path gives the SAME loss gradients as
    the XLA path (same param tree, same dropout rngs, drop-path on)."""
    import jax
    import jax.numpy as jnp

    from computervision_codes_tpu.models.swin import (SwinTransformer,
                                                      VARIANTS)

    cfg = dict(VARIANTS["swin_nano_64"])
    m_x = SwinTransformer(fused_train=False, drop_path_rate=0.1,
                          dtype=jnp.float32, **cfg)
    m_f = SwinTransformer(fused_train=True, drop_path_rate=0.1,
                          dtype=jnp.float32, **cfg)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    v = m_x.init(jax.random.PRNGKey(1), x)
    key = jax.random.PRNGKey(3)

    def loss(model, params):
        out = model.apply({"params": params}, x, train=True,
                          rngs={"dropout": key})
        return jnp.mean(out["pooled"] ** 2) + jnp.mean(
            out["feature_map"] ** 2)

    lx, gx = jax.value_and_grad(lambda p: loss(m_x, p))(v["params"])
    lf, gf = jax.value_and_grad(lambda p: loss(m_f, p))(v["params"])
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-5)
    flat_x = jax.tree_util.tree_leaves_with_path(gx)
    flat_f = jax.tree_util.tree_leaves_with_path(gf)
    for (kx, ax), (kf, af) in zip(flat_x, flat_f):
        assert kx == kf
        np.testing.assert_allclose(
            np.asarray(af), np.asarray(ax), atol=5e-5,
            err_msg=jax.tree_util.keystr(kx))


def test_window_mhsa_fused_odd_window(rng):
    """Odd windows (the 224-class models' window 7) run at a padded
    (w+1)^2 in-kernel geometry with -1e9-killed padded keys; parity vs the
    unpadded XLA reference, with and without the shift mask."""
    import jax.numpy as jnp

    from computervision_codes_tpu.models.swin import _shift_attn_mask
    from computervision_codes_tpu.ops.window_mhsa import (
        window_mhsa_fused,
        window_mhsa_reference,
    )

    b, hw, c, heads, w = 1, 14, 64, 2, 7
    n = w * w
    x = jnp.asarray(rng.standard_normal((b, hw, hw, c)), jnp.float32)
    gamma = jnp.asarray(1 + 0.1 * rng.standard_normal(c), jnp.float32)
    beta = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.1, jnp.float32)
    bqkv = jnp.asarray(rng.standard_normal(3 * c) * 0.01, jnp.float32)
    wproj = jnp.asarray(rng.standard_normal((c, c)) * 0.1, jnp.float32)
    bproj = jnp.asarray(rng.standard_normal(c) * 0.01, jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, n, n)) * 0.1, jnp.float32)
    for mask in (None, jnp.asarray(_shift_attn_mask(hw, hw, w, 3))):
        want = window_mhsa_reference(x, gamma, beta, wqkv, bqkv, wproj,
                                     bproj, bias, mask, window=w,
                                     num_heads=heads)
        got = window_mhsa_fused(x, gamma, beta, wqkv, bqkv, wproj, bproj,
                                bias, mask, window=w, num_heads=heads)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5)


def test_swin_224_fused_eval_matches_xla(rng):
    """A window-7 Swin (the TERL default family, swin_T_224 geometry at
    nano scale) through the fused eval path == the pure-XLA model."""
    import jax
    import jax.numpy as jnp

    from computervision_codes_tpu.models.swin import SwinTransformer

    kw = dict(embed_dim=32, depths=(2, 2), num_heads=(2, 4), window_size=7,
              num_classes=0)
    img = jnp.asarray(rng.standard_normal((1, 56, 56, 3)), jnp.float32)
    xla = SwinTransformer(fused_eval=False, **kw)
    v = xla.init(jax.random.PRNGKey(0), img)
    want = xla.apply(v, img)["pooled"]
    fused = SwinTransformer(fused_eval=True, **kw)
    got = fused.apply(v, img)["pooled"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-5)


def test_window_mhsa_fused_quant_odd_window(rng):
    """quant=True at window 7 (the swin_L_224 stage-3 --quant_eval
    configuration): the padded geometry and the int8 projections compose —
    PTQ-noise drift only."""
    import jax.numpy as jnp

    from computervision_codes_tpu.ops.window_mhsa import (
        window_mhsa_fused,
        window_mhsa_reference,
    )

    b, hw, c, heads, w = 1, 14, 32, 4, 7
    n = w * w
    f = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.1, jnp.float32)
    x = f(b, hw, hw, c)
    args = (f(c) + 1, f(c), f(c, 3 * c), f(3 * c), f(c, c), f(c),
            f(heads, n, n))
    want = window_mhsa_reference(x, *args, None, window=w, num_heads=heads)
    got = window_mhsa_fused(x, *args, None, window=w, num_heads=heads,
                            quant=True)
    drift = np.max(np.abs(np.asarray(got) - np.asarray(want)))
    assert drift < 0.05, drift


def test_stem_pool_fused_matches_reference(rng):
    """Fused stem conv+bias+relu+maxpool (ops/stem_pool) vs the chained
    XLA reference, across sizes, chunk boundaries, and bf16."""
    import jax.numpy as jnp

    from computervision_codes_tpu.ops.stem_pool import (stem_pool_fused,
                                                        stem_pool_reference)

    w = jnp.asarray(rng.standard_normal((7, 7, 3, 64)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(64) * 0.5, jnp.float32)
    for (h, wd), chunk in (((32, 56), 8), ((32, 56), 3), ((16, 16), 32),
                           ((24, 40), 2)):
        x = jnp.asarray(rng.standard_normal((2, h, wd, 3)), jnp.float32)
        want = stem_pool_reference(x, w, bias)
        got = stem_pool_fused(x, w, bias, chunk=chunk)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, err_msg=f"{(h, wd, chunk)}")
    # bf16 (the serving dtype)
    xb = jnp.asarray(rng.standard_normal((1, 32, 56, 3)), jnp.bfloat16)
    want = stem_pool_reference(xb, w.astype(jnp.bfloat16), bias)
    got = stem_pool_fused(xb, w.astype(jnp.bfloat16), bias, chunk=4)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=0.05)

    # B > 8 host-side split paths: B=16 takes the clean split=8 lax.map
    # branch, B=10 the small-divisor map branch (split=5), and B=9/11/22
    # (best divisors 3/1/2, all < 4) the pad-to-multiple-of-8 branch.
    for b in (9, 10, 11, 16, 22):
        x = jnp.asarray(rng.standard_normal((b, 16, 16, 3)), jnp.float32)
        want = stem_pool_reference(x, w, bias)
        got = stem_pool_fused(x, w, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, err_msg=f"B={b}")

    import pytest

    with pytest.raises(ValueError):
        stem_pool_fused(jnp.zeros((1, 30, 56, 3)), w, bias)


def test_int8_e2e_fused_stem_tracks_float(rng):
    """make_int8_e2e(fused_stem=True): the Pallas stem+pool kernel slots
    into the serving path with float-model fidelity preserved."""
    import jax
    import jax.numpy as jnp

    from computervision_codes_tpu.models.pipeline import EndToEndRecognizer
    from computervision_codes_tpu.models.quantized import make_int8_e2e

    model = EndToEndRecognizer(num_layers_pg=3, num_layers_r=2,
                               num_refinements=1, num_f_maps=8,
                               dtype=jnp.float32)
    clips = jnp.asarray(rng.standard_normal((1, 4, 32, 56, 3)), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), clips)
    want = np.asarray(model.apply(v, clips)["ivt"]).ravel()
    fn, q = make_int8_e2e(model, v, calibrate_clips=clips, fused_stem=True)
    got = np.asarray(fn(q, clips)["ivt"]).ravel()
    assert np.corrcoef(got, want)[0, 1] > 0.995
