"""Fused window attention — Pallas TPU kernel + XLA reference.

The Swin teacher is HBM-bound: XLA materializes the (B·nW, H, N, N)
attention tensor (bias+mask+softmax) between the two matmuls — at SwinL-384
stage 1 that is ~0.5 GB fp32 per block, dwarfing the FLOPs. This kernel
keeps the whole score tensor in VMEM per window block: one grid step loads
q/k/v for a window, adds the relative-position bias (+ shift mask), runs
softmax and the PV matmul without touching HBM in between.

API: (B·nW, H, N, D) q/k/v, (H, N, N) bias, optional (nW, N, N) additive
mask (the shifted-window mask — indexed per window via the grid).
Backward recomputes through the XLA reference (custom_vjp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def window_attention_reference(q, k, v, bias, mask=None, nw: int = 1):
    """q,k,v (BW, H, N, D); bias (H, N, N); mask (nW, N, N) additive."""
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("whnd,whmd->whnm", q * scale, k)
    s = s + bias[None].astype(s.dtype)
    if mask is not None:
        bw = q.shape[0]
        s = s.reshape(bw // nw, nw, *s.shape[1:])
        s = s + mask[None, :, None].astype(s.dtype)
        s = s.reshape(bw, *s.shape[2:])
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("whnm,whmd->whnd", p, v)


def _kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *, num_heads,
            scale):
    # refs: q/k/v (1, H, N, D); bias (H, N, N); mask (1, N, N)
    m = mask_ref[0].astype(jnp.float32)
    for h in range(num_heads):  # static unroll; each is one MXU matmul
        q = q_ref[0, h].astype(jnp.float32) * scale  # (N, D)
        k = k_ref[0, h].astype(jnp.float32)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s + bias_ref[h].astype(jnp.float32) + m
        p = jax.nn.softmax(s, axis=-1)
        o = jax.lax.dot_general(p, v_ref[0, h].astype(jnp.float32),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, h] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("nw",))
def window_attention_pallas(q, k, v, bias, mask=None, nw: int = 1):
    bw, h, n, d = q.shape
    if mask is None:
        mask = jnp.zeros((1, n, n), q.dtype)
        nw = 1
    out = pl.pallas_call(
        functools.partial(_kernel, num_heads=h, scale=d ** -0.5),
        out_shape=jax.ShapeDtypeStruct((bw, h, n, d), q.dtype),
        grid=(bw,),
        in_specs=[
            pl.BlockSpec((1, h, n, d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, n, d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, n, d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, n, n), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, n), lambda i: (i % nw, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, n, d), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(q, k, v, bias, mask)
    return out


def _kernel_multi(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *,
                  num_heads, scale):
    """G windows per grid step: one batched QK^T, bias+mask+softmax and PV
    entirely in VMEM — amortizes the per-step grid overhead that made the
    one-window kernel lose to XLA (docs/BENCH.md negative result)."""
    g, h = q_ref.shape[0], num_heads
    n, d = q_ref.shape[2], q_ref.shape[3]
    q = q_ref[...].astype(jnp.float32).reshape(g * h, n, d) * scale
    k = k_ref[...].astype(jnp.float32).reshape(g * h, n, d)
    v = v_ref[...].astype(jnp.float32).reshape(g * h, n, d)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    s = s.reshape(g, h, n, n)
    s = s + bias_ref[...].astype(jnp.float32)[None]
    s = s + mask_ref[...].astype(jnp.float32)[:, None]
    p = jax.nn.softmax(s, axis=-1).reshape(g * h, n, n)
    o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[...] = o.reshape(g, h, n, d).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("nw", "block_windows"))
def window_attention_pallas_multi(q, k, v, bias, mask=None, nw: int = 1,
                                  block_windows: int = 8):
    """Multi-window blocked variant of window_attention_pallas.

    Requires block_windows to divide B·nW and (when a shift mask is
    present) to divide nw, so each block's masks are one contiguous slice.
    """
    bw, h, n, d = q.shape
    if mask is None:
        nw = 1
    g = block_windows

    def fits(g):
        # blocks must tile bw; with a shift mask the per-block mask slice
        # must stay aligned: either g | nw (slice) or nw | g (tile)
        return bw % g == 0 and (nw <= 1 or nw % g == 0 or g % nw == 0)

    while not fits(g):
        g //= 2
    if mask is None:
        mask_full = jnp.zeros((g, n, n), q.dtype)
        nmask = g
    elif nw >= g:
        mask_full = mask
        nmask = nw
    else:  # nw < g: tile the mask cycle up to one block
        reps = g // nw
        mask_full = jnp.tile(mask, (reps, 1, 1))
        nmask = g
    out = pl.pallas_call(
        functools.partial(_kernel_multi, num_heads=h, scale=d ** -0.5),
        out_shape=jax.ShapeDtypeStruct((bw, h, n, d), q.dtype),
        grid=(bw // g,),
        # the batched f32 score tensor (g*h, n, n) exceeds Mosaic's 16 MiB
        # default scoped-vmem at Swin sizes (measured: 26.4 MiB at g=8,
        # h=6, n=144); v5e has 128 MiB VMEM — allow most of it
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((g, h, n, d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, h, n, d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, h, n, d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, n, n), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n, n), lambda i: (i % (nmask // g), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, h, n, d), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(q, k, v, bias, mask_full)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def window_attention_fused(q, k, v, bias, mask, nw: int = 1,
                           block_windows: int = 8):
    """Differentiable fused window attention (Pallas fwd on TPU).

    block_windows > 1 uses the multi-window kernel (batched QK^T/PV per
    grid step); 1 falls back to the original one-window kernel.
    """
    if jax.default_backend() == "tpu":
        if block_windows > 1:
            return window_attention_pallas_multi(
                q, k, v, bias, mask, nw=nw, block_windows=block_windows)
        return window_attention_pallas(q, k, v, bias, mask, nw=nw)
    return window_attention_reference(q, k, v, bias, mask, nw=nw)


def _fwd(q, k, v, bias, mask, nw, block_windows):
    return window_attention_fused(q, k, v, bias, mask, nw, block_windows), \
        (q, k, v, bias, mask)


def _bwd(nw, block_windows, res, g):
    q, k, v, bias, mask = res
    f = lambda q, k, v, bias: window_attention_reference(q, k, v, bias, mask,
                                                         nw=nw)
    _, vjp = jax.vjp(f, q, k, v, bias)
    return vjp(g) + (None,)


window_attention_fused.defvjp(_fwd, _bwd)
