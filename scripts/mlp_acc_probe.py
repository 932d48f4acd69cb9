"""Cost of the f32 scratch accumulator in the fused MLP half-block.

Round 4 re-measured the SwinL-384 teacher 9% (bf16) / 23% (int8 stacked)
slower than round 3; the only kernel-path change touching even-window
models was the ADVICE-r3 f32 VMEM scratch for hidden-chunked partial sums
(ops/mlp_block.py). This times mlp_block_fused at the four SwinL-384
stage shapes (b=16) with acc_f32 True (round 4) vs False (round 3's
accumulate-in-bf16), plus max|diff| between the two.

Run (TPU, single process!): python scripts/mlp_acc_probe.py
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from computervision_codes_tpu.ops.mlp_block import mlp_block_fused

STAGES = [  # (name, hw, c) at SwinL-384 b=16
    ("s1", 96, 192),
    ("s2", 48, 384),
    ("s3", 24, 768),
    ("s4", 12, 1536),
]


def timed(fn, args, iters=20):
    # distinct input per step (eps rotation) so XLA cannot hoist the
    # loop-invariant kernel out of the scan (docs/BENCH.md methodology)
    eps = (jax.random.normal(jax.random.PRNGKey(9), (8,)) * 1e-3).astype(
        args[0].dtype)

    @jax.jit
    def loop(*a):
        def step(acc, i):
            out = fn(a[0] + eps[i % 8], *a[1:])
            return acc + out.astype(jnp.float32).mean(), None

        total, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(iters))
        return total

    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / iters


def main(batch=16):
    rng = jax.random.PRNGKey(0)
    for name, hw, c in STAGES:
        ks = jax.random.split(rng, 8)
        x = jax.random.normal(ks[0], (batch, hw, hw, c), jnp.bfloat16)
        gamma = jnp.ones((c,), jnp.float32)
        beta = jnp.zeros((c,), jnp.float32)
        w1 = jax.random.normal(ks[1], (c, 4 * c), jnp.bfloat16) * 0.02
        b1 = jnp.zeros((4 * c,), jnp.float32)
        w2 = jax.random.normal(ks[2], (4 * c, c), jnp.bfloat16) * 0.02
        b2 = jnp.zeros((c,), jnp.float32)
        args = (x, gamma, beta, w1, b1, w2, b2)

        ms_f32 = timed(lambda *a: mlp_block_fused(*a, acc_f32=True),
                       args) * 1e3
        ms_bf16 = timed(lambda *a: mlp_block_fused(*a, acc_f32=False),
                        args) * 1e3
        d = float(jnp.max(jnp.abs(
            mlp_block_fused(*args, acc_f32=True).astype(jnp.float32)
            - mlp_block_fused(*args, acc_f32=False).astype(jnp.float32))))
        print(json.dumps({
            "stage": name, "tokens": batch * hw * hw, "c": c,
            "ms_acc_f32": round(ms_f32, 3), "ms_acc_bf16": round(ms_bf16, 3),
            "f32_cost_x": round(ms_f32 / ms_bf16, 3),
            "max_abs_diff": round(d, 6)}))


if __name__ == "__main__":
    main()
