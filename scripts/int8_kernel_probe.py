"""Probe: int8 MXU matmuls INSIDE a Pallas kernel at Swin MLP/QKV shapes.

Round-2/3 found XLA-level int8 GEMMs at Swin shapes are SLOWER than bf16
(0.5 vs 0.2 ms — the quantize/dequant materializations eat the double-rate
win). Inside a kernel the story may differ: the activation is already in
VMEM, so quantize (absmax + scale + round) is register-resident VPU work
and the int32->f32 dequant fuses into the epilogue. This times, per shape:

  bf16     — dot_general(bf16, bf16) -> f32 (the shipped kernels' op)
  int8w    — bf16 activation x int8 weight (weight-only quant; MXU runs
             mixed int8/bf16 at bf16 rate — expect parity, tests lowering)
  int8     — in-kernel dynamic per-block activation quant to int8 x int8
             weight -> int32, f32 dequant epilogue

Run (TPU, single process!): python scripts/int8_kernel_probe.py
"""

import functools
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scripts.swin_roofline import timed_scan


def _bf16_kernel(x_ref, w_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def _int8w_kernel(x_ref, w_ref, s_ref, o_ref):
    acc = jax.lax.dot_general(
        x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[...] = (acc * s_ref[...].astype(jnp.float32)).astype(jnp.bfloat16)


def _int8_kernel(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    amax = jnp.max(jnp.abs(x)) + 1e-6
    q = jnp.round(x * (127.0 / amax)).astype(jnp.int8)
    acc = jax.lax.dot_general(
        q, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    scale = (amax / 127.0) * s_ref[...].astype(jnp.float32)
    o_ref[...] = (acc.astype(jnp.float32) * scale).astype(jnp.bfloat16)


def run(name, m, k, n, blk=None):
    blk = blk or m
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (m, k), jnp.bfloat16)
    w = jax.random.normal(rng, (k, n), jnp.bfloat16)
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) * 16), -127, 127)
    s = jnp.full((1, n), 1 / 16.0, jnp.float32)
    grid = (m // blk,)
    common = dict(
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.bfloat16),
        grid=grid,
        out_specs=pl.BlockSpec((blk, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )
    xspec = pl.BlockSpec((blk, k), lambda i: (i, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM)

    flops = 2 * m * k * n
    variants = {
        "bf16": lambda x: pl.pallas_call(
            _bf16_kernel, in_specs=[xspec, wspec], **common)(x, w),
        "int8w": lambda x: pl.pallas_call(
            _int8w_kernel, in_specs=[xspec, wspec, sspec], **common)(
                x, wq.astype(jnp.bfloat16), s),
        "int8": lambda x: pl.pallas_call(
            _int8_kernel, in_specs=[xspec, wspec, sspec], **common)(
                x, wq.astype(jnp.int8), s),
    }
    for tag, fn in variants.items():
        try:
            t = timed_scan(lambda x: fn(x).astype(jnp.float32).mean(), (x,),
                           iters=32)
            print(json.dumps({
                "metric": f"{name} {tag}", "ms": round(t * 1e3, 3),
                "tflops": round(flops / t / 1e12, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"metric": f"{name} {tag}",
                              "error": str(e).split("\n")[0][:120]}),
                  flush=True)


def main():
    # stage-3 MLP at the ACTUAL fused-kernel chunk shapes: per grid step
    # GEMM1 (1024, 768)@(768, 1024-chunk), GEMM2 (1024, 1024)@(1024, 768)
    run("MLP1 s3 chunk (1152x768x1024)", 9216, 768, 1024, blk=1152)
    run("MLP2 s3 chunk (1152x1024x768)", 9216, 1024, 768, blk=1152)
    # stage-3 MLP halves at the fused kernel's token blocking
    run("MLP1 s3 (9216x768x3072)", 9216, 768, 3072, blk=512)
    run("MLP2 s3 (9216x3072x768)", 9216, 3072, 768, blk=512)
    # stage-3 QKV projection at the merged-kernel row-strip blocking
    run("QKV s3 (288x768x2304)", 9216, 768, 2304, blk=288)
    run("proj s3 (288x768x768)", 9216, 768, 768, blk=288)
    # stage-2 shapes (row strip = 576 tokens, c=384)
    run("QKV s2 (576x384x1152)", 36864, 384, 1152, blk=576)
    run("MLP1 s2 chunk (1152x384x1024)", 36864, 384, 1024, blk=1152)
    run("MLP2 s2 chunk (1152x1024x384)", 36864, 1024, 384, blk=1152)
    # stage-4 MLP chunks (c=1536, hidden 6144 chunked at 1024)
    run("MLP1 s4 chunk (1152x1536x1024)", 2304, 1536, 1024, blk=1152)
    run("MLP2 s4 chunk (1152x1024x1536)", 2304, 1024, 1536, blk=1152)
    # stage-1 QKV (row strip = 1152 tokens)
    run("QKV s1 (1152x192x576)", 9216, 192, 576, blk=1152)


if __name__ == "__main__":
    main()
