"""Fused ResNet stem: maxpool3x3/s2(relu(conv7x7/s2(x) + bias)) in ONE
Pallas kernel.

Why: the student's e2e ceiling is the stem (docs/BENCH.md round-3
roofline — the 7x7/s2 conv runs at ~40% MXU because C_in=3 starves the
systolic array) plus the maxpool's HBM round-trip (the conv's
(H/2, W/2, 64) output — 3.7 MB/frame at 256x448 — is written to HBM and
read back by reduce_window). This kernel:

  * takes the 2x2 space-to-depth view of the padded input (the
    models/resnet._s2d_conv1 reparametrization: conv7x7/s2 over 3ch ==
    conv4x4/s1 VALID over 12ch — identical multiply-adds);
  * builds the 16-tap im2col patches IN VMEM (never materialized to HBM)
    and runs ONE (rows*W2, 192) @ (192, 64) GEMM per row chunk — K=192
    instead of the channel-starved K=12/147;
  * applies bias + ReLU and the 3x3/s2 maxpool on the VMEM-resident conv
    output, so only the pooled (H/4, W/4, 64) map ever touches HBM.

Maxpool padding note: torch pads the pool with -inf, but the pool input
is post-ReLU (>= 0) and every edge window contains at least one real
cell, so zero-padding is EXACT — the kernel prepends a zero row/column
to the conv output instead of special-casing edges.

Weights arrive BN-FOLDED (the serving config: models/quantized._qconv
float-stem dict) — w (7,7,3,64) already multiplied by the BN affine,
bias the folded BN bias. Serving-path integration:
quantized_resnet_apply(fused_stem=True) / InferenceSession.create.

Re-designs the stem of MT4MTLKD/Spatial_cnn/network.py:95-118
(torchvision resnet conv1+bn1+relu+maxpool) as a single TPU program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xs_ref, w_ref, b_ref, o_ref, *, h2, w2, pool_rows, chunk):
    """One batch item per grid step; static python loop over row chunks.

    xs_ref: (1, h2, w2, 12) s2d input (padded); w_ref: (192, 64) tap-major
    GEMM weights; o_ref: (1, pool_rows, cw//2, 64).
    """
    cw = w2 - 3          # conv output width  (= W/2)
    ch = h2 - 3          # conv output height (= H/2)
    pw = cw // 2         # pool output width  (= W/4)
    xs = xs_ref[0]
    bias = b_ref[...].astype(jnp.float32)

    for ci in range(pl.cdiv(pool_rows, chunk)):
        p0 = ci * chunk
        pr = min(chunk, pool_rows - p0)
        # conv rows needed: 2*p0-1 .. 2*(p0+pr-1)+1; row -1 (chunk 0) is
        # pool padding — a ZERO row prepended post-epilogue (NOT computed
        # from zero input, whose epilogue would be relu(bias) != 0)
        r_lo = max(0, 2 * p0 - 1)
        r_hi = min(ch, 2 * (p0 + pr - 1) + 2)  # exclusive
        rows = r_hi - r_lo
        # im2col: 16 shifted views of xs, concatenated along channels
        taps = []
        for dy in range(4):
            for dx in range(4):
                sl = xs[r_lo + dy:r_lo + rows + dy, dx:dx + cw, :]
                taps.append(sl.reshape(rows * cw, 12))
        patches = jnp.concatenate(taps, axis=-1)  # (rows*cw, 192)
        conv = jax.lax.dot_general(
            patches, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        conv = jax.nn.relu(conv + bias).astype(xs.dtype)
        conv = conv.reshape(rows, cw, 64)
        if r_lo == 0 and 2 * p0 - 1 < 0:
            conv = jnp.concatenate(
                [jnp.zeros((1, cw, 64), xs.dtype), conv], axis=0)
            rows += 1
        # prepend the zero pool-pad COLUMN; right/bottom need none
        # ((W/2 + 2 - 3)//2 + 1 == W/4 uses cols -1 .. W/2-1 only)
        conv = jnp.concatenate(
            [jnp.zeros((rows, 1, 64), xs.dtype), conv], axis=1)
        # rows now = 2*pr + 1 (local row l <-> conv row 2*p0 - 1 + l)
        body = conv[:2 * pr].reshape(pr, 2, cw + 1, 64)
        pair = jnp.maximum(body[:, 0], body[:, 1])      # rows 2p-1, 2p
        if pr == 1:  # body[1:, 0] would be zero-size — Mosaic rejects
            third = conv[2:3]                           # rows 2p+1
        else:
            third = jnp.concatenate([body[1:, 0], conv[2 * pr:2 * pr + 1]],
                                    axis=0)             # rows 2p+1
        rowp = jnp.maximum(pair, third)                 # (pr, cw+1, 64)
        cbody = rowp[:, :2 * pw].reshape(pr, pw, 2, 64)
        cpair = jnp.maximum(cbody[:, :, 0], cbody[:, :, 1])
        cthird = jnp.concatenate(
            [cbody[:, 1:, 0], rowp[:, 2 * pw:2 * pw + 1]], axis=1)
        o_ref[0, p0:p0 + pr] = jnp.maximum(cpair, cthird)


@functools.partial(jax.jit, static_argnames=("chunk",))
def stem_pool_fused(x, w, bias, chunk: int | None = None):
    """x (B, H, W, 3) normalized frames (H, W divisible by 4);
    w (7, 7, 3, 64) BN-folded stem kernel; bias (64,).
    Returns (B, H/4, W/4, 64) == maxpool3x3/s2/p1(relu(conv7x7/s2/p3 + b)).
    """
    b, h, wd, c = x.shape
    if h % 4 or wd % 4:
        raise ValueError(f"fused stem needs H, W divisible by 4, got "
                         f"{(h, wd)}")
    if chunk is None:
        # scoped-VMEM model, calibrated from the on-chip OOM at 256x448
        # (chunk=32 allocated 18.38 MiB against Mosaic's 16 MiB stack —
        # the per-chunk im2col patches/taps + f32 accumulator scale at
        # ~2400 B per (pool row x conv col); fixed blocks ~1.75 MiB).
        # Largest chunk <= 32 that keeps the estimate under 13.5 MiB.
        fixed = (h // 2 + 3) * (wd // 2 + 3) * 12 * 2 \
            + (h // 4) * (wd // 4) * 64 * 2 + 128 * 1024
        chunk = max(4, min(32, int((13.5e6 - fixed) // ((wd // 2) * 2400))))
        # a remainder chunk of 1 hits the Mosaic zero-size corner AND
        # compiles a second kernel body for one row — shrink past it
        while chunk > 4 and (h // 4) % chunk == 1:
            chunk -= 1
    oc = w.shape[-1]
    # host-side (XLA, fuses into the preceding normalize): pad + s2d view
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    h2, w2 = h // 2 + 3, wd // 2 + 3
    xs = xp.reshape(b, h2, 2, w2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(b, h2, w2, 4 * c)
    # tap-major GEMM weights: rows ordered (dy, dx, (py, px, c))
    kpad = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
    k2 = kpad.reshape(4, 2, 4, 2, c, oc).transpose(0, 2, 1, 3, 4, 5)
    k2 = k2.reshape(16 * 4 * c, oc).astype(x.dtype)

    pool_rows, pool_cols = h // 4, wd // 4
    kernel = functools.partial(_kernel, h2=h2, w2=w2, pool_rows=pool_rows,
                               chunk=chunk)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, pool_rows, pool_cols, oc),
                                       x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h2, w2, 4 * c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16 * 4 * c, oc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((oc,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, pool_rows, pool_cols, oc),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(xs, k2, bias.astype(jnp.float32))


def stem_pool_reference(x, w, bias):
    """XLA reference: conv7x7/s2/p3 + bias + relu + maxpool3x3/s2/p1."""
    import flax.linen as nn

    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = jax.nn.relu(y + bias.astype(jnp.float32)).astype(x.dtype)
    return nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
