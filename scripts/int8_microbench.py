"""Does XLA:TPU run int8 convs on the MXU's double-rate path? Measure it.

v5e peak is ~394 TOPS int8 vs ~197 TFLOPs bf16. If lax.conv with int8
inputs and int32 accumulation hits that path, an int8 student backbone
roughly doubles the headline bench. This microbench times the ResNet18
shapes that dominate the e2e step (docs/BENCH.md component table):
stage-1 3x3 convs at 64x112 spatial / 64ch, stage-2 128ch, plus the 7x7
stem, in bf16 vs int8, using the chained-scan methodology (docs/BENCH.md).

Run (TPU, single process!): python scripts/int8_microbench.py
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=20):
    @jax.jit
    def loop(*a):
        def step(acc, i):
            out = fn(*a, i)
            return acc + out.astype(jnp.float32).mean(), None

        total, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(iters))
        return total

    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / iters


def conv(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_i8(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def main():
    rng = np.random.default_rng(0)
    b = 256  # frames per step

    cases = [
        ("stage1 3x3 64ch @64x112", (b, 64, 112, 64), (3, 3, 64, 64), 1),
        ("stage2 3x3 128ch @32x56", (b, 32, 56, 128), (3, 3, 128, 128), 1),
        ("stage3 3x3 256ch @16x28", (b, 16, 28, 256), (3, 3, 256, 256), 1),
        ("stage4 3x3 512ch @8x14", (b, 8, 14, 512), (3, 3, 512, 512), 1),
    ]
    for name, xs, ws, stride in cases:
        xf = jnp.asarray(rng.standard_normal(xs), jnp.bfloat16)
        wf = jnp.asarray(rng.standard_normal(ws) * 0.05, jnp.bfloat16)
        xq = jnp.asarray(rng.integers(-127, 128, xs), jnp.int8)
        wq = jnp.asarray(rng.integers(-127, 128, ws), jnp.int8)
        flops = 2 * np.prod(xs) * ws[0] * ws[1] * ws[3] / (stride * stride)

        # vary the input via a cheap index-dependent cast so scans don't hoist
        tb = timed(lambda x, w, i: conv(
            x + jnp.bfloat16(0) * i.astype(jnp.bfloat16), w, stride), xf, wf)
        ti = timed(lambda x, w, i: conv_i8(
            jnp.bitwise_xor(x, (i % 2).astype(jnp.int8)), w, stride), xq, wq)
        print(json.dumps({
            "case": name,
            "bf16_ms": round(tb * 1e3, 3),
            "int8_ms": round(ti * 1e3, 3),
            "bf16_tflops": round(flops / tb / 1e12, 1),
            "int8_tops": round(flops / ti / 1e12, 1),
            "speedup": round(tb / ti, 2),
        }))


if __name__ == "__main__":
    main()
