"""ResNet18 stem/stage1 probe: where do the 42% go, and what would help?

The e2e student spends 23.6 ms (stem+maxpool) + 18.6 ms (stage1) per 1024
frames (docs/BENCH.md). This measures, overhead-subtracted:
  * the 7x7/s2 stem conv bf16 vs int8 with achieved TFLOP/s;
  * conv_general_dilated_patches im2col + GEMM alternative;
  * maxpool;
  * a stage-1 3x3 conv bf16 vs int8.

Run (TPU): python scripts/stem_probe.py
"""

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from scripts.swin_roofline import timed_scan, report

B = 128  # frames per step (bench uses 4x256 = 1024; scale per 1024 at end)


def conv(x, w, stride=1, acc=None):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc)


def main():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, 256, 448, 3), jnp.bfloat16)
    w = (jax.random.normal(rng, (7, 7, 3, 64)) * 0.1).astype(jnp.bfloat16)
    flops = 2 * B * 128 * 224 * 64 * 7 * 7 * 3

    s = timed_scan(lambda x: conv(x, w, 2).astype(jnp.float32).mean(), (x,))
    report(f"stem conv 7x7/s2 bf16 (b={B})", s, flops)

    xi = (x * 16).astype(jnp.int8)
    wi = (w * 100).astype(jnp.int8)
    s = timed_scan(lambda x: conv(
        x.astype(jnp.int8), wi, 2, jnp.int32).astype(jnp.float32).mean(),
        (x,))
    report(f"stem conv 7x7/s2 int8 (b={B})", s, flops, peak=394e12)

    # round 4: space-to-depth execution plan (models/resnet._s2d_conv1) —
    # C_in 3 -> 12, stride folds away; same multiply-adds
    from computervision_codes_tpu.models.resnet import _s2d_conv1

    s = timed_scan(lambda x: _s2d_conv1(x, w).astype(jnp.float32).mean(),
                   (x,))
    report(f"stem conv as s2d 4x4/s1 12ch bf16 (b={B})", s, flops)
    # int8 variant of the s2d plan (round-3 int8-stem negative was at
    # C_in=3; 12 channels may flip the sign)
    w2i = None

    def s2d_int8(x):
        b_, h_, w_, c_ = x.shape
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        xs = xp.reshape(b_, (h_ + 6) // 2, 2, (w_ + 6) // 2, 2, c_)
        xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(
            b_, (h_ + 6) // 2, (w_ + 6) // 2, 4 * c_)
        kpad = jnp.pad(w, ((0, 1), (0, 1), (0, 0), (0, 0)))
        k2 = kpad.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5)
        k2 = (k2.reshape(4, 4, 12, 64) * 100).astype(jnp.int8)
        out = jax.lax.conv_general_dilated(
            (xs * 16).astype(jnp.int8), k2, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return out.astype(jnp.float32).mean()

    s = timed_scan(s2d_int8, (x,))
    report(f"stem conv as s2d 4x4/s1 12ch int8 (b={B})", s, flops,
           peak=394e12)

    # round 4: the fused stem+pool Pallas kernel (in-VMEM im2col, pool
    # fused — the conv output never touches HBM; ops/stem_pool)
    from computervision_codes_tpu.ops.stem_pool import stem_pool_fused

    bias = (jax.random.normal(rng, (64,)) * 0.1).astype(jnp.float32)
    s = timed_scan(lambda x: stem_pool_fused(x, w, bias).astype(
        jnp.float32).mean(), (x,))
    report(f"FUSED stem conv+bias+relu+maxpool Pallas (b={B})", s, flops)

    # im2col via conv_general_dilated_patches + GEMM
    wm = w.reshape(-1, 64)

    def patches_gemm(x):
        p = jax.lax.conv_general_dilated_patches(
            x, (7, 7), (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return (p.reshape(-1, 147) @ wm).astype(jnp.float32).mean()

    s = timed_scan(patches_gemm, (x,))
    report(f"stem as patches+GEMM bf16 (b={B})", s, flops)

    # maxpool 3x3/s2
    y = jax.random.normal(rng, (B, 128, 224, 64), jnp.bfloat16)
    s = timed_scan(lambda y: jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        "SAME").astype(jnp.float32).mean(), (y,))
    report(f"maxpool 3x3/s2 (b={B})", s)

    # stage-1 3x3 conv 64->64 at 64x112
    z = jax.random.normal(rng, (B, 64, 112, 64), jnp.bfloat16)
    w3 = (jax.random.normal(rng, (3, 3, 64, 64)) * 0.05).astype(jnp.bfloat16)
    flops3 = 2 * B * 64 * 112 * 64 * 9 * 64
    s = timed_scan(lambda z: conv(z, w3).astype(jnp.float32).mean(), (z,))
    report(f"stage1 conv 3x3 64ch bf16 (b={B})", s, flops3)
    w3i = (w3 * 100).astype(jnp.int8)
    s = timed_scan(lambda z: conv(
        z.astype(jnp.int8), w3i, 1, jnp.int32).astype(jnp.float32).mean(),
        (z,))
    report(f"stage1 conv 3x3 64ch int8 (b={B})", s, flops3, peak=394e12)

    # stage-2..4 equivalents: 128ch @ 32x56, 256 @ 16x28, 512 @ 8x14
    for ch, hh, ww_ in ((128, 32, 56), (256, 16, 28), (512, 8, 14)):
        z = jax.random.normal(rng, (B, hh, ww_, ch), jnp.bfloat16)
        wc = (jax.random.normal(rng, (3, 3, ch, ch)) * 0.05).astype(
            jnp.bfloat16)
        fl = 2 * B * hh * ww_ * ch * 9 * ch
        s = timed_scan(lambda z, wc=wc: conv(z, wc).astype(
            jnp.float32).mean(), (z,))
        report(f"stage conv 3x3 {ch}ch bf16 (b={B})", s, fl)
        wci = (wc * 100).astype(jnp.int8)
        s = timed_scan(lambda z, wci=wci: conv(
            z.astype(jnp.int8), wci, 1, jnp.int32).astype(
                jnp.float32).mean(), (z,))
        report(f"stage conv 3x3 {ch}ch int8 (b={B})", s, fl, peak=394e12)


if __name__ == "__main__":
    main()
