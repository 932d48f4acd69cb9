"""Fused dilated residual TCN layer — Pallas TPU kernel + XLA reference.

The TCN hot loop (MT4MTLKD/Temporal_tenco/network.py:186-198; 41 layers per
forward) is, per layer:  y = x + W2 · relu(conv3_dilated(x; W1) + b1) + b2.
A dilated width-3 conv over (T, C) is three shifted (T, C)x(C, C) matmuls —
pure MXU work. The Pallas kernel fuses the whole layer (three taps, bias,
relu, 1x1 projection, residual) into one VMEM-resident pass.

Because blocks along T overlap by a 2·dilation halo (blocked BlockSpecs
cannot express overlapping windows), the input stays in HBM (ANY memory
space) and each grid step DMAs its halo'd slice into VMEM scratch with an
element-offset ``pl.ds`` copy, then runs the three matmuls from scratch.

Backward runs through the XLA reference via custom_vjp (identical math:
training uses short clips where XLA's fusion is already fine; the kernel is
the full-video inference hot path). Dropout stays outside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def dilated_residual_reference(x, w_taps, b1, w2, b2, dilation: int,
                               causal: bool = False):
    """XLA reference. x (B, T, C); w_taps (3, C, C) = [left, center, right].

    ``causal``: taps at (t-2d, t-d, t) — front-padded 2d zeros, the
    reference's causal Conv1d (Temporal_tenco/network.py causal variant).
    """
    d = dilation
    t = x.shape[1]
    if causal:
        xp = jnp.pad(x, ((0, 0), (2 * d, 0), (0, 0)))
        h = (xp[:, :t] @ w_taps[0] + xp[:, d:d + t] @ w_taps[1]
             + xp[:, 2 * d:2 * d + t] @ w_taps[2] + b1)
    else:
        xp = jnp.pad(x, ((0, 0), (d, d), (0, 0)))
        h = (xp[:, :t] @ w_taps[0] + xp[:, d:d + t] @ w_taps[1]
             + xp[:, 2 * d:2 * d + t] @ w_taps[2] + b1)
    h = jax.nn.relu(h)
    return x + h @ w2 + b2


def _mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _kernel(x_hbm, wl_ref, wc_ref, wr_ref, b1_ref, w2_ref, b2_ref, o_ref,
            scratch, sem, *, dilation: int, block_t: int, halo: int,
            causal: bool):
    # ``halo`` is the sublane-aligned halo (>= dilation, or >= 2*dilation
    # when causal); the DMA slice length block_t + 2*halo must be
    # tiling-aligned on TPU.
    i = pl.program_id(0)
    j = pl.program_id(1)
    d = dilation
    start = j * block_t  # element offset into the front-halo-padded T axis
    dma = pltpu.make_async_copy(
        x_hbm.at[i, pl.ds(start, block_t + 2 * halo), :], scratch, sem)
    dma.start()
    dma.wait()
    xb = scratch[...].astype(jnp.float32)  # (block_t + 2*halo, C)
    center = xb[halo:halo + block_t]
    # tap offsets relative to the output position t: symmetric (-d, 0, +d)
    # or causal (-2d, -d, 0) — front-zero-padded Conv1d semantics
    o_l, o_c, o_r = (-2 * d, -d, 0) if causal else (-d, 0, d)
    h = _mm(xb[halo + o_l:halo + o_l + block_t],
            wl_ref[...].astype(jnp.float32))
    h += _mm(xb[halo + o_c:halo + o_c + block_t],
             wc_ref[...].astype(jnp.float32))
    h += _mm(xb[halo + o_r:halo + o_r + block_t],
             wr_ref[...].astype(jnp.float32))
    h = jax.nn.relu(h + b1_ref[...].astype(jnp.float32))
    out = _mm(h, w2_ref[...].astype(jnp.float32))
    o_ref[0] = (center + out + b2_ref[...].astype(jnp.float32)).astype(
        o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dilation", "block_t",
                                             "causal"))
def dilated_residual_pallas(x, w_taps, b1, w2, b2, dilation: int,
                            block_t: int = 512, causal: bool = False):
    b, t, c = x.shape
    d = dilation
    tp = ((t + block_t - 1) // block_t) * block_t
    # sublane-aligned halo so the DMA slice length is tiling-aligned;
    # causal taps reach back 2*dilation
    align = 16 if x.dtype == jnp.bfloat16 else 8
    reach = 2 * d if causal else d
    halo = ((reach + align - 1) // align) * align
    # zero padding: front/back halo (conv zero-pad) + tail to block multiple
    xp = jnp.pad(x, ((0, 0), (halo, tp - t + halo), (0, 0)))
    grid = (b, tp // block_t)
    rep = lambda i, j: (0, 0)
    out = pl.pallas_call(
        functools.partial(_kernel, dilation=d, block_t=block_t, halo=halo,
                          causal=causal),
        out_shape=jax.ShapeDtypeStruct((b, tp, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # full array in HBM
            pl.BlockSpec((c, c), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), rep, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), rep, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_t, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_t + 2 * halo, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=jax.default_backend() != "tpu",
    )(xp, w_taps[0], w_taps[1], w_taps[2], b1[None], w2, b2[None])
    return out[:, :t]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def dilated_residual_fused(x, w_taps, b1, w2, b2, dilation: int,
                           causal: bool = False):
    """Differentiable fused layer: Pallas forward on TPU, XLA backward."""
    if jax.default_backend() == "tpu":
        return dilated_residual_pallas(x, w_taps, b1, w2, b2, dilation,
                                       causal=causal)
    return dilated_residual_reference(x, w_taps, b1, w2, b2, dilation,
                                      causal=causal)


def _fused_fwd(x, w_taps, b1, w2, b2, dilation, causal):
    return dilated_residual_fused(x, w_taps, b1, w2, b2, dilation, causal), \
        (x, w_taps, b1, w2, b2)


def _fused_bwd(dilation, causal, res, g):
    x, w_taps, b1, w2, b2 = res
    f = lambda *a: dilated_residual_reference(*a, dilation, causal=causal)
    _, vjp = jax.vjp(f, x, w_taps, b1, w2, b2)
    return vjp(g)


dilated_residual_fused.defvjp(_fused_fwd, _fused_bwd)
