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


def q8_weight(w):
    """Per-output-channel symmetric int8 weight quant for 2-D (k, n)
    GEMM weights: returns (wq int8, scale f32 (1, n)). Thin reshape over
    ops/quant.quantize_weight so the kernels and the conv/dense PTQ paths
    share ONE quantization policy (clip + scale floor)."""
    from .quant import quantize_weight

    wq, scale = quantize_weight(w.astype(jnp.float32), axis=-1)
    return wq, scale.astype(jnp.float32).reshape(1, -1)


def q8_dot(x, wq, wscale):
    """In-kernel int8 GEMM with dynamic per-block activation quant.

    x f32 (m, k); wq int8 (k, n); wscale f32 (1, n). One absmax scalar per
    token block (the probe's winning scheme, scripts/int8_kernel_probe.py):
    quantize is VPU-register work, the int8 MXU runs at double rate, and
    the int32->f32 dequant fuses into the epilogue. Returns f32 (m, n).
    """
    amax = jnp.max(jnp.abs(x)) + 1e-6
    q = jnp.round(x * (127.0 / amax)).astype(jnp.int8)
    acc = jax.lax.dot_general(q, wq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * ((amax / 127.0) * wscale)


def _kernel(x_ref, gamma_ref, beta_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            s1_ref, s2_ref, o_ref, *acc_ref, quant, res_add, n_chunks,
            acc_f32=True):
    j = pl.program_id(1)
    x = x_ref[...]
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    normed = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
    normed = (normed * gamma_ref[0].astype(jnp.float32)
              + beta_ref[0].astype(jnp.float32))
    if quant:
        h = _gelu_exact(q8_dot(normed, w1_ref[...], s1_ref[...])
                        + b1_ref[0].astype(jnp.float32))
        o = q8_dot(h, w2_ref[...], s2_ref[...])
    else:
        normed = normed.astype(x.dtype)
        h = jax.lax.dot_general(normed, w1_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        h = h + b1_ref[0].astype(jnp.float32)
        h = _gelu_exact(h).astype(x.dtype)
        o = jax.lax.dot_general(h, w2_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)

    if n_chunks == 1:
        # residual + bias in the model dtype (matches the module's add)
        ob = (o + b2_ref[0].astype(jnp.float32)).astype(o_ref.dtype)
        o_ref[...] = x + ob if res_add else ob
        return

    if not acc_f32:
        # accumulate in the output dtype (one bf16 rounding per chunk) —
        # the round-3 path, kept as an A/B arm for the f32 scratch's cost
        @pl.when(j == 0)
        def _():
            ob = (o + b2_ref[0].astype(jnp.float32)).astype(o_ref.dtype)
            o_ref[...] = x + ob if res_add else ob

        @pl.when(j > 0)
        def _():
            o_ref[...] = o_ref[...] + o.astype(o_ref.dtype)
        return

    # hidden-chunked: partial sums accumulate in an f32 VMEM scratch so
    # the bf16 production path doesn't round once per chunk; cast to the
    # model dtype exactly once at the last chunk
    acc = acc_ref[0]

    @pl.when(j == 0)
    def _():
        base = o + b2_ref[0].astype(jnp.float32)
        acc[...] = base + xf if res_add else base

    @pl.when(j > 0)
    def _():
        acc[...] = acc[...] + o

    @pl.when(j == n_chunks - 1)
    def _():
        o_ref[...] = acc[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_tokens",
                                             "hidden_chunk", "quant",
                                             "res_add", "acc_f32"))
def mlp_block_fused(x, gamma, beta, w1, b1, w2, b2,
                    block_tokens: int = 1024, hidden_chunk: int = 0,
                    quant: bool = False, res_add: bool = True,
                    acc_f32: bool = True):
    """x (..., C) -> x + mlp(LN(x)), fused. Leading dims are flattened;
    the largest power-of-two block <= block_tokens dividing T is used,
    ditto hidden_chunk vs the hidden width.

    ``quant`` runs both GEMMs on the int8 MXU path: per-output-channel
    int8 weights (quantized here at trace time — loop-invariant, so XLA
    hoists it out of scan loops) x dynamic per-token-block activation
    scales (q8_dot). Measured 1.2-1.5x on SwinL stage-3/4 chunk shapes;
    accuracy is PTQ-grade (opt-in via SwinTransformer(quant_eval=True)).
    """
    shape = x.shape
    c = shape[-1]
    hidden = w1.shape[1]
    t = 1
    for d in shape[:-1]:
        t *= d
    xf = x.reshape(t, c)
    # explicit block_tokens/hidden_chunk are honored as given (bench
    # sweeps); the auto path sizes against Mosaic's 16 MiB scoped budget
    auto = block_tokens == 1024 and hidden_chunk == 0
    blk = block_tokens
    if auto and quant:
        # on-chip sweep (scripts/int8_kernel_probe + /tmp q8 sweep, b=16):
        # int8 wants blk=512 and the FULL hidden width per step — hidden-
        # chunked weight re-DMA costs int8 more than it saves (0.315 vs
        # 0.446 ms at stage 3; 0.222 vs 0.398 at stage 4). Un-chunked
        # weight blocks are grid-invariant, so Mosaic does not
        # double-buffer them and even stage 4's 18.9 MB pair compiles.
        blk = 512
    while t % blk:
        blk //= 2
    # hidden_chunk 0 = auto: bf16 chunks at 1024; int8 runs un-chunked
    hc = hidden_chunk or (hidden if quant else 1024)
    while hidden % hc:
        hc //= 2
    if auto and not quant:
        # empirical VMEM model, calibrated on two measured allocations
        # (blk1024/hc1024/c768 = 16.38 MiB; blk256/hc1024/c1536 = 16.59
        # MiB): x-side blocks ~12 B/elem (+4 B/elem f32 accumulator
        # scratch when hidden-chunked), hidden intermediates ~2 B/elem,
        # weight blocks ~8 B/elem (bf16 x2 matrices x2 double-buffering).
        # 15 MiB budget leaves margin for the borderline stage-4 case.
        while blk > 128 and (blk * c * 16 + blk * hc * 2 + c * hc * 8
                             ) > 15 * 2 ** 20:
            if blk >= hc:
                blk //= 2
            else:
                hc //= 2
        while hc > 256 and (blk * c * 16 + blk * hc * 2 + c * hc * 8
                            ) > 15 * 2 ** 20:
            hc //= 2
    if quant:
        w1, s1 = q8_weight(w1)
        w2, s2 = q8_weight(w2)
    else:
        s1 = jnp.zeros((1, hc), jnp.float32)
        s2 = jnp.zeros((1, c), jnp.float32)
    n_chunks = hidden // hc
    out = pl.pallas_call(
        functools.partial(_kernel, quant=quant, res_add=res_add,
                          n_chunks=n_chunks, acc_f32=acc_f32),
        out_shape=jax.ShapeDtypeStruct((t, c), x.dtype),
        # f32 accumulator only when chunking is active: the single-chunk
        # paths (all int8 auto configs) stay byte-identical in VMEM
        scratch_shapes=([pltpu.VMEM((blk, c), jnp.float32)]
                        if n_chunks > 1 and acc_f32 else []),
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
            pl.BlockSpec((1, hc), (lambda i, j: (0, j)) if quant
                         else (lambda i, j: (0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((blk, c), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(xf, gamma.reshape(1, c), beta.reshape(1, c),
      w1, b1.reshape(1, hidden), w2, b2.reshape(1, c), s1, s2)
    return out.reshape(shape)


def mlp_block_reference(x, gamma, beta, w1, b1, w2, b2,
                        res_add: bool = True):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    normed = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * gamma + beta).astype(
        x.dtype)
    h = jax.nn.gelu((normed @ w1 + b1).astype(jnp.float32),
                    approximate=False).astype(x.dtype)
    o = (h @ w2 + b2).astype(x.dtype)
    return x + o if res_add else o
