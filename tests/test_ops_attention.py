import jax
import jax.numpy as jnp
import numpy as np

from computervision_codes_tpu.ops.attention import (
    attention_pallas,
    attention_reference,
    multi_head_attention,
)


def _qkv(rng, b=2, h=3, t=50, d=24):
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    return q, k, v


def test_pallas_matches_reference(rng):
    q, k, v = _qkv(rng)
    ref = attention_reference(q, k, v)
    got = attention_pallas(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pallas_unaligned_shapes(rng):
    # t and d deliberately not multiples of 128
    q, k, v = _qkv(rng, b=1, h=2, t=133, d=17)
    ref = attention_reference(q, k, v)
    got = attention_pallas(q, k, v, block_q=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_mha_grad_flows(rng):
    q, k, v = _qkv(rng, b=1, h=1, t=16, d=8)

    def loss(q):
        return jnp.sum(multi_head_attention(q, k, v) ** 2)

    g = jax.grad(loss)(q)
    g_ref = jax.grad(lambda q: jnp.sum(attention_reference(q, k, v) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=2e-5)


def test_flash_streaming_matches_reference(rng):
    from computervision_codes_tpu.ops.attention import flash_attention_pallas

    # t not a multiple of block_k; d unaligned
    q, k, v = _qkv(rng, b=1, h=2, t=300, d=24)
    ref = attention_reference(q, k, v)
    got = flash_attention_pallas(q, k, v, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_flash_attention_backward_matches_reference(rng):
    """Fused streaming backward (dQ/dK/dV kernels) vs XLA autodiff, with
    T not a block multiple and unaligned head dim."""
    from computervision_codes_tpu.ops.attention import flash_attention

    q, k, v = _qkv(rng, b=1, h=2, t=300, d=24)

    def loss_flash(q, k, v):
        return jnp.sum(jnp.sin(flash_attention(q, k, v, 128, 128)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(attention_reference(q, k, v)))

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=3e-5)


def test_flash_attention_forward_value(rng):
    from computervision_codes_tpu.ops.attention import flash_attention

    q, k, v = _qkv(rng, b=2, h=1, t=260, d=16)
    np.testing.assert_allclose(
        np.asarray(flash_attention(q, k, v, 128, 128)),
        np.asarray(attention_reference(q, k, v)), atol=3e-5)
