"""Fused transformer MLP half-block: x + mlp2(gelu(mlp1(LN(x)))).

Companion to ops/window_mhsa.py — the other half of a Swin block. Through
XLA the stage-1 half costs ~3 ms/block beyond its 0.45 ms of GEMMs (LN,
GELU, residual and cast materializations over 56-85 MB activations); this
kernel runs the whole chain per token block in VMEM (measured 1.9-2.0x,
scripts/swin_fused_bench.py).

Token-flattened with HIDDEN-DIM CHUNKING: grid (token blocks, hidden
chunks), the output block accumulated across the chunk axis (init with
x + b2 at chunk 0). Keeping the full 4C hidden activation plus both
weights resident OOMs Mosaic's 16 MiB scoped VMEM at SwinL stage 3
(measured: 29.1 MiB) — chunking re-DMAs weight slices per token block
(~0.1 ms total) instead. LN is recomputed per chunk (VPU-cheap).
GELU is the exact erf variant via Abramowitz-Stegun 7.1.26 (Mosaic has no
erf primitive; max err 1.5e-7, far below bf16 resolution) for checkpoint
parity with models/common.gelu_exact.

Re-designs the Mlp of MT4MTLKD/Spatial_transformer/models/swin_transformer.py:34-63.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(z):
    """Abramowitz-Stegun 7.1.26 erf (max abs err 1.5e-7)."""
    s = jnp.sign(z)
    z = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-z * z))


def _gelu_exact(x):
    """x * Phi(x) with the erf form — parity with models/common.gelu_exact
    (torch nn.GELU default)."""
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def _kernel(x_ref, gamma_ref, beta_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            o_ref):
    j = pl.program_id(1)
    x = x_ref[...]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    normed = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
    normed = (normed * gamma_ref[0].astype(jnp.float32)
              + beta_ref[0].astype(jnp.float32)).astype(x.dtype)
    h = jax.lax.dot_general(normed, w1_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = h + b1_ref[0].astype(jnp.float32)
    h = _gelu_exact(h).astype(x.dtype)
    o = jax.lax.dot_general(h, w2_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _():
        # residual + bias in the model dtype (matches the module's add)
        o_ref[...] = x + (o + b2_ref[0].astype(jnp.float32)).astype(
            o_ref.dtype)

    @pl.when(j > 0)
    def _():
        o_ref[...] = o_ref[...] + o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_tokens",
                                             "hidden_chunk"))
def mlp_block_fused(x, gamma, beta, w1, b1, w2, b2,
                    block_tokens: int = 1024, hidden_chunk: int = 1024):
    """x (..., C) -> x + mlp(LN(x)), fused. Leading dims are flattened;
    the largest power-of-two block <= block_tokens dividing T is used,
    ditto hidden_chunk vs the hidden width."""
    shape = x.shape
    c = shape[-1]
    hidden = w1.shape[1]
    t = 1
    for d in shape[:-1]:
        t *= d
    xf = x.reshape(t, c)
    blk = block_tokens
    while t % blk:
        blk //= 2
    hc = hidden_chunk
    while hidden % hc:
        hc //= 2
    # crude VMEM model (empirically calibrated: blk=1024, hc=1024, c=768
    # measured 16.38 MiB): stay under Mosaic's 16 MiB scoped budget
    while blk > 128 and (blk * c * 12 + blk * hc * 6 + c * hc * 4
                         ) > 13 * 2 ** 20:
        if blk >= hc:
            blk //= 2
        else:
            hc //= 2
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((t, c), x.dtype),
        # hidden chunks iterate fastest so each output block accumulates
        # in place before the next token block arrives
        grid=(t // blk, hidden // hc),
        in_specs=[
            pl.BlockSpec((blk, c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hc), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hc), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hc, c), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, c), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(xf, gamma.reshape(1, c), beta.reshape(1, c),
      w1, b1.reshape(1, hidden), w2, b2.reshape(1, c))
    return out.reshape(shape)


def mlp_block_reference(x, gamma, beta, w1, b1, w2, b2):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    normed = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * gamma + beta).astype(
        x.dtype)
    h = jax.nn.gelu((normed @ w1 + b1).astype(jnp.float32),
                    approximate=False).astype(x.dtype)
    return x + (h @ w2 + b2).astype(x.dtype)
