"""Fully-fused Swin block: both half-blocks (window-MHSA + MLP) in ONE
Pallas kernel — x -> x + proj(attn(LN1(x))) -> y -> y + mlp2(gelu(mlp1(LN2(y)))).

Why: ops/window_mhsa.py + ops/mlp_block.py already keep each half VMEM-
resident, but between them the intermediate y makes a full HBM round-trip
(write + read) and a second kernel launch. Merging removes both: the
attention result stays in a VMEM scratch that the MLP phase consumes.
Per SwinL-384 teacher step that is 22 blocks x (one launch + ~2x the
block activation in HBM traffic).

Schedule: grid (B, Hp/w, hidden_chunks), hidden chunks iterating fastest.
At chunk 0 the attention phase runs (the group-packed block-diagonal
formulation of ops/window_mhsa.py — see there for the packing math) and
parks y in scratch; every chunk then applies LN2 (recomputed per chunk,
VPU-cheap — same trade as ops/mlp_block.py) and accumulates its slice of
the MLP into the output block. Chunking keeps stage 3 (c=768, 4c=3072,
14 MiB of weights) under Mosaic's 16 MiB scoped VMEM.

GELU is the exact erf variant (ops/mlp_block._gelu_exact) for checkpoint
parity with models/common.gelu_exact.

Scope: eval path (DropPath identity), dims <= 768, Hp/Wp multiples of the
window (models/swin.py gates and falls back to the split kernels / XLA).
Parity: tests/test_ops_kernels.py (CPU interpret) + on-chip in
scripts/swin_fused_bench.py.

Re-designs the SwinTransformerBlock.forward of
MT4MTLKD/Spatial_transformer/models/swin_transformer.py:166-289
(attn + MLP residual chain) — same math, single-kernel TPU schedule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mlp_block import _gelu_exact, q8_dot, q8_weight
from .window_mhsa import (_group_size, packed_window_attention,
                          packing_matrices)


def _ln(x, gamma, beta):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    normed = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
    return (normed * gamma.astype(jnp.float32)
            + beta.astype(jnp.float32)).astype(x.dtype)


def _kernel(x_ref, g1_ref, be1_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
            biasp_ref, mask_ref, kmask_ref, sum_ref, exp_ref,
            g2_ref, be2_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            sqkv_ref, sproj_ref, s1_ref, s2_ref,
            o_ref, y_scr, *, window, num_heads, cols, use_mask, group,
            quant):
    w = window
    n = w * w
    c = x_ref.shape[-1]
    hd = c // num_heads
    g = group
    ng = num_heads // g
    scale = hd ** -0.5
    hch = pl.program_id(2)

    @pl.when(hch == 0)
    def _attention_phase():
        rows = x_ref[0]  # (w, Wp, C)
        wp = rows.shape[1]
        normed = _ln(rows.reshape(w * wp, c), g1_ref[...], be1_ref[...])
        if quant:
            qkv = q8_dot(normed.astype(jnp.float32), wqkv_ref[...],
                         sqkv_ref[...])
        else:
            qkv = jax.lax.dot_general(
                normed, wqkv_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(x_ref.dtype)
        qkv = qkv.reshape(w, wp, 3 * c)
        kmask = kmask_ref[...]
        for j in range(cols):  # static unroll over the windows of this row
            win = qkv[:, j * w:(j + 1) * w, :].reshape(n, 3 * c)
            mwin = jnp.tile(mask_ref[j].astype(jnp.float32), (1, g)) \
                if use_mask else None
            o = packed_window_attention(
                win, c=c, hd=hd, g=g, ng=ng, scale=scale,
                biasp_ref=biasp_ref, mwin=mwin, kmask=kmask,
                sum_ref=sum_ref, exp_ref=exp_ref, dtype=x_ref.dtype)
            if quant:
                o = q8_dot(o.astype(jnp.float32), wproj_ref[...],
                           sproj_ref[...])
            else:
                o = jax.lax.dot_general(
                    o, wproj_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            o = (o + bproj_ref[...].astype(jnp.float32)).astype(x_ref.dtype)
            res = rows[:, j * w:(j + 1) * w, :].reshape(n, c)
            y_scr[:, j * w:(j + 1) * w, :] = (o + res).reshape(w, w, c)

    y = y_scr[...].reshape(-1, c)
    normed = _ln(y, g2_ref[...], be2_ref[...])
    if quant:
        h = _gelu_exact(q8_dot(normed.astype(jnp.float32), w1_ref[...],
                               s1_ref[...])
                        + b1_ref[0].astype(jnp.float32))
        o = q8_dot(h, w2_ref[...], s2_ref[...])
    else:
        h = jax.lax.dot_general(normed, w1_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        h = _gelu_exact(h + b1_ref[0].astype(jnp.float32)).astype(y.dtype)
        o = jax.lax.dot_general(h, w2_ref[...], (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)

    wp = x_ref.shape[2]

    @pl.when(hch == 0)
    def _init():
        o_ref[0] = (y + (o + b2_ref[...].astype(jnp.float32)).astype(
            o_ref.dtype)).reshape(w, wp, c)

    @pl.when(hch > 0)
    def _accum():
        o_ref[0] = o_ref[0] + o.astype(o_ref.dtype).reshape(w, wp, c)


@functools.partial(jax.jit, static_argnames=("window", "num_heads",
                                             "hidden_chunk", "quant"))
def swin_block_fused(x, g1, be1, wqkv, bqkv, wproj, bproj, bias, mask,
                     g2, be2, w1, b1, w2, b2, *, window: int,
                     num_heads: int, hidden_chunk: int = 0,
                     quant: bool = False):
    """x (B, Hp, Wp, C) -> full Swin block (attn half + MLP half), fused.

    ``bias`` (H, N, N) relative-position bias; ``mask`` (nW, N, N) additive
    shift mask or None. Hp, Wp must be multiples of ``window``.
    ``hidden_chunk`` 0 picks the largest chunk of the MLP hidden dim that
    keeps weights + activations inside Mosaic's 16 MiB scoped VMEM.
    """
    b, hp, wp, c = x.shape
    w = window
    n = w * w
    hd = c // num_heads
    cols = wp // w
    hidden = w1.shape[1]
    use_mask = mask is not None
    if not use_mask:
        mask = jnp.zeros((cols, n, n), x.dtype)
    mask = mask.astype(x.dtype)

    hc = hidden_chunk or hidden
    # crude VMEM model: attention weights + per-chunk MLP weights + the
    # f32 hidden chunk + qkv f32 must stay under ~13 MiB (16 MiB budget)
    while hc > 128 and (c * 3 * c * 2 + c * c * 2 + 2 * c * hc * 2
                        + w * wp * hc * 4 + w * wp * 3 * c * 4
                        ) > 13 * 2 ** 20:
        hc //= 2
    while hidden % hc:
        hc //= 2

    g = _group_size(num_heads, hd)
    ng = num_heads // g
    biasp, km, sm, em = packing_matrices(bias, num_heads, hd, n, x.dtype)

    if quant:
        wqkv, sqkv = q8_weight(wqkv)
        wproj, sproj = q8_weight(wproj)
        w1, s1 = q8_weight(w1)
        w2, s2 = q8_weight(w2)
    else:
        sqkv = jnp.zeros((1, 3 * c), jnp.float32)
        sproj = jnp.zeros((1, c), jnp.float32)
        s1 = jnp.zeros((1, hc), jnp.float32)
        s2 = jnp.zeros((1, c), jnp.float32)

    kernel = functools.partial(_kernel, window=w, num_heads=num_heads,
                               cols=cols, use_mask=use_mask, group=g,
                               quant=quant)
    vec = lambda d: pl.BlockSpec((d,), lambda i, r, h: (0,),
                                 memory_space=pltpu.VMEM)
    fixed = lambda *shape: pl.BlockSpec(
        shape, lambda i, r, h: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        # hidden chunks iterate fastest: the output block accumulates in
        # place; the attention scratch persists across the chunk axis
        grid=(b, hp // w, hidden // hc),
        in_specs=[
            pl.BlockSpec((1, w, wp, c), lambda i, r, h: (i, r, 0, 0),
                         memory_space=pltpu.VMEM),
            vec(c), vec(c),
            fixed(c, 3 * c), vec(3 * c), fixed(c, c), vec(c),
            fixed(ng, n, g * n),
            # shift-mask windows are row-major: grid step r covers nW ids
            # [r*cols, (r+1)*cols); unshifted passes zeros
            pl.BlockSpec((cols, n, n),
                         (lambda i, r, h: (r, 0, 0)) if use_mask
                         else (lambda i, r, h: (0, 0, 0)),
                         memory_space=pltpu.VMEM),
            fixed(g * n, g * hd), fixed(g * n, g), fixed(g, g * n),
            vec(c), vec(c),
            pl.BlockSpec((c, hc), lambda i, r, h: (0, h),
                         memory_space=pltpu.VMEM),
            # 2D (1, hidden) so the hidden-chunk blocking divides the lane
            # tiling (a 1D (3072,) operand tiles at 1024 and rejects 768)
            pl.BlockSpec((1, hc), lambda i, r, h: (0, h),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hc, c), lambda i, r, h: (h, 0),
                         memory_space=pltpu.VMEM),
            vec(c),
            fixed(1, 3 * c), fixed(1, c),
            pl.BlockSpec((1, hc), (lambda i, r, h: (0, h)) if quant
                         else (lambda i, r, h: (0, 0)),
                         memory_space=pltpu.VMEM),
            fixed(1, c),
        ],
        out_specs=pl.BlockSpec((1, w, wp, c), lambda i, r, h: (i, r, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((w, wp, c), x.dtype)],
        interpret=jax.default_backend() != "tpu",
    )(x, g1, be1, wqkv, bqkv, wproj, bproj, biasp, mask,
      jnp.asarray(km, x.dtype), jnp.asarray(sm), jnp.asarray(em),
      g2, be2, w1, b1.reshape(1, hidden), w2, b2, sqkv, sproj, s1, s2)


def swin_block_reference(x, g1, be1, wqkv, bqkv, wproj, bproj, bias, mask,
                         g2, be2, w1, b1, w2, b2, *, window: int,
                         num_heads: int):
    """XLA reference for parity tests — the two split references chained."""
    from .mlp_block import mlp_block_reference
    from .window_mhsa import window_mhsa_reference

    y = window_mhsa_reference(x, g1, be1, wqkv, bqkv, wproj, bproj, bias,
                              mask, window=window, num_heads=num_heads)
    return mlp_block_reference(y, g2, be2, w1, b1, w2, b2)
