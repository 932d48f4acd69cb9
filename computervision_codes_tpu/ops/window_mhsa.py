"""Fully-fused window MHSA half-block: x + proj(window_attn(LN(x))).

Why (measured, scripts/swin_roofline.py + swin_attn_probe.py, v5e b=16):
a SwinL-384 stage-1 attention half-block costs ~4.1 ms through XLA — all
HBM: the qkv 5D transpose (510 MB), the materialized f32 score tensor
(509 MB x ~3 passes), and the cast/partition passes. The raw GEMMs run at
84-100% MXU and are NOT the problem. Earlier kernels (ops/window_attention)
that took pre-split (BW, H, N, 32) q/k/v also lost: the 32-wide minor dim
wastes 3/4 of every DMA lane and forces f32 relayouts (measured 2.3 ms).

This kernel instead consumes the natural (B, Hp, Wp, C) layout (C is a
lane-aligned 128-multiple), and keeps EVERYTHING between the pre-norm
input and the residual add in VMEM:

    grid (B, Hp/w): one row of windows per step
      LN over C -> row QKV GEMM (w*Wp, C)@(C, 3C) -> per window, per
      HEAD GROUP of g heads (largest g | num_heads with g*head_dim <= 128):
      q_G (n, g*hd) @ (masked tile of k_G) (g*n, g*hd)^T gives all g score
      blocks in ONE bf16 MXU GEMM + packed rel-pos bias (+ tiled shift
      mask) -> f32 softmax (one row-wide max upper-bounds every block max
      and per-block softmax is shift-invariant; block denominators via a
      ones-matmul) -> p_G @ (masked tile of v_G) emits the group's heads
      pre-concatenated -> groups concat -> proj GEMM -> + x

The head-group packing trades g-fold FLOP redundancy for g/4-fold MXU
utilization (a wash at g*hd <= 128) but eliminates per-head sub-128-lane
slicing, 2*g-fold matmul instruction count, per-head softmax dispatch and
the head concat — measured 1.13x (stage 1, g=3) to 1.39x (stage 3, g=4)
over the per-head loop it replaced (scripts/swin_pack_probe.py; a batched
dot_general formulation fails to lower: Mosaic has no (n,C)->(n,h,hd)
vector shape cast).

HBM traffic per stage-1 half-block: 85 MB in + 85 MB out (was ~3.3 GB).

Scope: eval path (deterministic; DropPath is identity), head_dim = 32
(all Swin variants), dims whose QKV weight fits VMEM (<= 768 — stage 4's
1536-dim weight is 14 MiB and that stage is GEMM-bound anyway; the module
falls back to the XLA path there). Odd windows (224-class models, window
7) run at a padded (w+1)^2 geometry: the window tile is zero-padded
in-kernel so every shape cast is 8-aligned (Mosaic rejects (49, C)
casts), padded keys are killed by -1e9 in the padded bias, and padded
query rows are sliced off before the residual — 64/49 extra attention
FLOPs, none of the XLA path's HBM traffic. The shift roll/unroll stays
outside (LN and the residual are positionwise, so they commute with the
roll).
Parity: tests/test_ops_kernels.py (CPU interpret) + on-chip check in
scripts/swin_fused_bench.py vs the XLA block.

Re-designs MT4MTLKD/Spatial_transformer/models/swin_transformer.py:66-162
(WindowAttention.forward) — same math, TPU-native schedule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _group_size(num_heads: int, head_dim: int) -> int:
    """Largest divisor g of num_heads with g*head_dim <= 128 (one MXU pass)."""
    g = max(1, 128 // head_dim)
    while num_heads % g:
        g -= 1
    return g



def packed_window_attention(win, *, c, hd, g, ng, scale, biasp_ref, mwin,
                            kmask, sum_ref, exp_ref, dtype):
    """Group-packed attention for ONE window (shared by the split and
    merged kernels). ``win`` (n, 3c) packed qkv rows; ``mwin`` is the
    g-tiled additive shift mask (n, g*n) or None. Returns (n, c)."""
    outs = []
    for G in range(ng):  # static unroll over head groups
        qg = win[:, G * g * hd:(G + 1) * g * hd]
        kg = win[:, c + G * g * hd:c + (G + 1) * g * hd]
        vg = win[:, 2 * c + G * g * hd:2 * c + (G + 1) * g * hd]
        kbig = jnp.tile(kg, (g, 1)) * kmask  # block-diag (g*n, g*hd)
        s = jax.lax.dot_general(
            qg, kbig, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = s + biasp_ref[G].astype(jnp.float32)
        if mwin is not None:
            s = s + mwin
        # row-wide max >= each block max; per-block softmax is
        # shift-invariant, so one subtraction stabilizes all blocks
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        denom = jax.lax.dot_general(  # (n, g) per-block sums
            e, sum_ref[...], (((1,), (0,)), ((), ())))
        # a head-block whose logits sit ~88+ below the row max underflows
        # to all-zero e; floor the denominator so that block emits zeros
        # instead of 0 * inf = NaN (bounded error in a regime ordinary
        # logits never reach)
        denom = jnp.maximum(denom, 1e-30)
        dexp = jax.lax.dot_general(  # broadcast back to (n, g*n)
            1.0 / denom, exp_ref[...], (((1,), (0,)), ((), ())))
        p = (e * dexp).astype(dtype)
        vbig = jnp.tile(vg, (g, 1)) * kmask
        outs.append(jax.lax.dot_general(
            p, vbig, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dtype))
    return outs[0] if ng == 1 else jnp.concatenate(outs, axis=-1)


def packing_matrices(bias, num_heads: int, head_dim: int, n: int,
                     dtype):
    """Host-side packing constants shared by the split and merged kernels:
    packed rel-pos bias (ng, n, g*n), block-diag keep mask (g*n, g*hd),
    per-block sum matrix (g*n, g) and broadcast matrix (g, g*n)."""
    g = _group_size(num_heads, head_dim)
    ng = num_heads // g
    biasp = bias.reshape(ng, g, n, n).transpose(0, 2, 1, 3).reshape(
        ng, n, g * n).astype(dtype)
    km = np.zeros((g * n, g * head_dim), np.float32)
    sm = np.zeros((g * n, g), np.float32)
    em = np.zeros((g, g * n), np.float32)
    for h in range(g):
        km[h * n:(h + 1) * n, h * head_dim:(h + 1) * head_dim] = 1.0
        sm[h * n:(h + 1) * n, h] = 1.0
        em[h, h * n:(h + 1) * n] = 1.0
    return biasp, km, sm, em


def _kernel(x_ref, gamma_ref, beta_ref, wqkv_ref, bqkv_ref, wproj_ref,
            bproj_ref, biasp_ref, mask_ref, kmask_ref, sum_ref, exp_ref,
            sqkv_ref, sproj_ref, o_ref, *, window, num_heads, cols,
            use_mask, rows_per_step, group, quant, res_add):
    from .mlp_block import q8_dot

    w = window
    # odd windows (the 224-class models' window 7) are padded to the next
    # even edge in-kernel: every shape cast becomes 8-aligned (Mosaic
    # rejects the (49, C) casts), padded KEYS are killed by -1e9 in the
    # padded bias, padded QUERY rows are computed and discarded
    wk = w + 1 if w % 2 else w
    n = wk * wk
    c = x_ref.shape[-1]
    hd = c // num_heads
    g = group
    ng = num_heads // g
    scale = hd ** -0.5

    rows = x_ref[0]  # (rows_per_step * w, Wp, C)
    wp = rows.shape[1]
    xf = rows.reshape(rows_per_step * w * wp, c).astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    normed = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
    normed = (normed * gamma_ref[...].astype(jnp.float32)
              + beta_ref[...].astype(jnp.float32))

    if quant:
        qkv = q8_dot(normed, wqkv_ref[...], sqkv_ref[...])
    else:
        qkv = jax.lax.dot_general(
            normed.astype(x_ref.dtype), wqkv_ref[...],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(x_ref.dtype)
    qkv = qkv.reshape(rows_per_step, w, wp, 3 * c)

    kmask = kmask_ref[...]
    for r in range(rows_per_step):  # static unroll over row-of-window strips
        row_q = qkv[r]
        for j in range(cols):  # static unroll over the windows of this row
            blk = row_q[:, j * w:(j + 1) * w, :]
            if wk != w:
                blk = jnp.pad(blk, ((0, wk - w), (0, wk - w), (0, 0)))
            win = blk.reshape(n, 3 * c)
            mwin = jnp.tile(mask_ref[r * cols + j].astype(jnp.float32),
                            (1, g)) if use_mask else None
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
            o = (o + bproj_ref[...].astype(jnp.float32)).astype(o_ref.dtype)
            if wk != w:
                # padded query rows are discarded here; the residual adds
                # on the (w, w, c) tile to keep every cast 8-aligned
                ot = o.reshape(wk, wk, c)[:w, :w, :]
                if res_add:
                    ot = ot + rows[r * w:(r + 1) * w, j * w:(j + 1) * w, :]
                o_ref[0, r * w:(r + 1) * w, j * w:(j + 1) * w, :] = ot
                continue
            if res_add:
                # residual in the model dtype (matches the module's add)
                res = rows[r * w:(r + 1) * w,
                           j * w:(j + 1) * w, :].reshape(n, c)
                o = o + res
            o_ref[0, r * w:(r + 1) * w, j * w:(j + 1) * w, :] = \
                o.reshape(w, w, c)


@functools.partial(jax.jit, static_argnames=("window", "num_heads",
                                             "rows_per_step", "quant",
                                             "res_add"))
def window_mhsa_fused(x, gamma, beta, wqkv, bqkv, wproj, bproj, bias,
                      mask, *, window: int, num_heads: int,
                      rows_per_step: int = 1, quant: bool = False,
                      res_add: bool = True):
    """x (B, Hp, Wp, C) -> x + proj(attn(LN(x))) with windowed attention.

    ``bias`` (H, N, N) relative-position bias; ``mask`` (nW, N, N) additive
    shift mask or None. Hp, Wp must be multiples of ``window`` (the module
    falls back to XLA otherwise). ``rows_per_step`` window-rows are
    processed per grid step (must divide Hp/window).

    ``quant`` runs the QKV and output projections on the int8 MXU path
    (per-channel int8 weights x dynamic per-row-strip activation scales,
    ops/mlp_block.q8_dot — measured 2.7x on the stage-3 QKV GEMM); the
    attention core stays bf16.
    """
    from .mlp_block import q8_weight
    b, hp, wp, c = x.shape
    w = window
    wk = w + 1 if w % 2 else w  # odd windows run at the padded geometry
    n = wk * wk
    hd = c // num_heads
    rows, cols = hp // w, wp // w
    r = rows_per_step
    while rows % r:
        r //= 2
    use_mask = mask is not None
    if wk != w:
        # pad the attention geometry (w, w) -> (wk, wk): zero-pad the
        # rel-pos bias / shift mask per window axis, then kill padded KEY
        # positions with an additive -1e9 (padded query rows are don't-care
        # — the kernel slices them off before the residual)
        pad5 = ((0, 0), (0, wk - w), (0, wk - w), (0, wk - w), (0, wk - w))
        bias = jnp.pad(bias.reshape(num_heads, w, w, w, w),
                       pad5).reshape(num_heads, n, n)
        keyvalid = np.zeros((wk, wk), np.float32)
        keyvalid[:w, :w] = 1.0
        bias = bias + jnp.asarray((1.0 - keyvalid.reshape(n)) * -1e9,
                                  bias.dtype)[None, None, :]
        if use_mask:
            mask = jnp.pad(mask.reshape(-1, w, w, w, w),
                           pad5).reshape(-1, n, n)
    if not use_mask:
        mask = jnp.zeros((r * cols, n, n), x.dtype)
    mask = mask.astype(x.dtype)

    g = _group_size(num_heads, hd)
    ng = num_heads // g
    biasp, km, sm, em = packing_matrices(bias, num_heads, hd, n, x.dtype)
    kmask = jnp.asarray(km, x.dtype)
    sum_mat = jnp.asarray(sm)
    exp_mat = jnp.asarray(em)

    if quant:
        wqkv, sqkv = q8_weight(wqkv)
        wproj, sproj = q8_weight(wproj)
    else:
        sqkv = jnp.zeros((1, 3 * c), jnp.float32)
        sproj = jnp.zeros((1, c), jnp.float32)

    kernel = functools.partial(_kernel, window=w, num_heads=num_heads,
                               cols=cols, use_mask=use_mask,
                               rows_per_step=r, group=g, quant=quant,
                               res_add=res_add)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, rows // r),
        in_specs=[
            pl.BlockSpec((1, r * w, wp, c), lambda i, rr: (i, rr, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, r: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, r: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 3 * c), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * c,), lambda i, r: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i, r: (0,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ng, n, g * n), lambda i, r: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            # shift-mask windows are row-major: grid step rr covers nW ids
            # [rr*r*cols, (rr+1)*r*cols); unshifted passes zeros
            pl.BlockSpec((r * cols, n, n),
                         (lambda i, rr: (rr, 0, 0)) if use_mask
                         else (lambda i, rr: (0, 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g * n, g * hd), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g * n, g), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, g * n), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * c), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, r: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r * w, wp, c),
                               lambda i, rr: (i, rr, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(x, gamma, beta, wqkv, bqkv, wproj, bproj, biasp, mask, kmask,
      sum_mat, exp_mat, sqkv, sproj)


def window_mhsa_reference(x, gamma, beta, wqkv, bqkv, wproj, bproj, bias,
                          mask, *, window: int, num_heads: int,
                          res_add: bool = True):
    """XLA reference for parity tests — same math, materialized."""
    b, hp, wp, c = x.shape
    w = window
    n = w * w
    hd = c // num_heads
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    normed = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * gamma + beta).astype(
        x.dtype)
    win = normed.reshape(b, hp // w, w, wp // w, w, c)
    win = win.transpose(0, 1, 3, 2, 4, 5).reshape(-1, n, c)
    qkv = (win.reshape(-1, c) @ wqkv).reshape(-1, n, 3 * c) + bqkv
    qkv = qkv.astype(x.dtype)
    q = qkv[..., :c].reshape(-1, n, num_heads, hd)
    k = qkv[..., c:2 * c].reshape(-1, n, num_heads, hd)
    v = qkv[..., 2 * c:].reshape(-1, n, num_heads, hd)
    s = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32) * (hd ** -0.5)
    s = s + bias[None].astype(jnp.float32)
    if mask is not None:
        nw = mask.shape[0]
        s = s.reshape(-1, nw, num_heads, n, n) + \
            mask[None, :, None].astype(jnp.float32)
        s = s.reshape(-1, num_heads, n, n)
    p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhnm,bmhd->bnhd", p, v).reshape(-1, n, c)
    o = (o.reshape(-1, c) @ wproj).reshape(-1, n, c) + bproj
    o = o.reshape(b, hp // w, wp // w, w, w, c).transpose(0, 1, 3, 2, 4, 5)
    o = o.reshape(b, hp, wp, c).astype(x.dtype)
    return x + o if res_add else o
