"""Bisect the round-4 int8 teacher regression (420.7 -> 325.6 fps).

Round-4's re-measure of the SwinL-384 Q2L serving stack came in 23% under
the round-3 headline with bf16 itself 9% down (docs/BENCH.md round-4
section). Code-level diffing leaves exactly one compute-path change on the
bf16 arm since the 420.7 measurement — the f32 VMEM scratch accumulator
for hidden-chunked MLP partial sums (commit 8649a55, ops/mlp_block.py) —
and NONE on the stacked int8 arm (the odd-window rework is inert at
window 12; quant MLPs run un-chunked so the scratch never engages).

This script settles it on-chip:
  * every arm measured with the SAME loop as scripts/int8_teacher_bench.py
    (iters=5, chained scan, one readback) so rows compare 1:1 with the
    round-3/round-4 numbers, REPEATED 3x for variance;
  * the dispatch/tunnel overhead is measured via an empty loop and an
    overhead-subtracted per-step is reported alongside (the raw rows carry
    overhead/iters ~ 5 ms/step of inflation — identical in all rounds);
  * arms: bf16 and stacked-int8, each with acc_f32 True (current default)
    and False (the exact round-3 accumulate-in-bf16 path), plus the
    current serving default (stacked + s2d patch embed).

Reference hot loop this serves:
/root/reference/MT4MTLKD/Spatial_transformer/models/swin_transformer.py:66-162

Run (TPU, single process!): python scripts/teacher_bisect_bench.py
"""

import functools
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

ITERS = 5
REPEATS = 3


def build_loop(fn, args, iters=ITERS):
    @jax.jit
    def loop(*a):
        eps = a[-1]

        def step(acc, i):
            return acc + fn(*a[:-1], eps[i]), None

        total, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(iters))
        return total

    float(loop(*args))  # compile + first run
    return loop


def time_loop(loop, args, iters=ITERS, repeats=REPEATS):
    per_step = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(loop(*args))
        per_step.append((time.perf_counter() - t0) / iters)
    return per_step


def measure_overhead():
    z = jnp.zeros((8, 8), jnp.float32)
    eps = jnp.zeros((ITERS,), jnp.float32)
    loop = build_loop(lambda z, e: (z + e).mean(), (z, eps))
    secs = min(time_loop(loop, (z, eps)))
    print(json.dumps({"metric": "fixed dispatch overhead",
                      "ms_per_loop": round(secs * ITERS * 1e3, 2)}),
          flush=True)
    return secs * ITERS


def main(batch=16, backbone="swin_L_384_22k", res=384):
    import computervision_codes_tpu.ops.mlp_block as mb
    from computervision_codes_tpu.models.q2l import Q2L
    from computervision_codes_tpu.models.quant_dense import (
        collect_dense_scales,
        int8_apply,
        quantize_dense_params,
    )

    overhead = measure_overhead()

    rng = jax.random.PRNGKey(0)
    imgs = jax.random.normal(rng, (batch, res, res, 3), jnp.bfloat16)
    eps = (jax.random.normal(rng, (ITERS,), jnp.float32) * 0.01).astype(
        jnp.bfloat16)

    model = Q2L(backbone=backbone, loss_type="i", dtype=jnp.bfloat16)
    variables = model.init(rng, imgs[:1])
    scales = collect_dense_scales(model, variables, imgs[:2])
    qd = quantize_dense_params(variables)
    qmodel = Q2L(backbone=backbone, loss_type="i",
                 dtype=jnp.bfloat16, quant_eval=True)
    qmodel_s2d = Q2L(backbone=backbone, loss_type="i",
                     dtype=jnp.bfloat16, quant_eval=True, s2d_embed=True)

    orig_mlp = mb.mlp_block_fused

    def bf16_fn(v, x, e):
        return model.apply(v, x + e)["logits"]["i"].astype(
            jnp.float32).mean()

    def stacked_fn(v, q, x, e):
        return int8_apply(qmodel, v, q, scales, x + e, min_features=512
                          )["logits"]["i"].astype(jnp.float32).mean()

    def s2d_fn(v, q, x, e):
        return int8_apply(qmodel_s2d, v, q, scales, x + e, min_features=512
                          )["logits"]["i"].astype(jnp.float32).mean()

    arms = [
        ("bf16 acc_f32 (r4 default)", bf16_fn, (variables, imgs, eps), True),
        ("bf16 acc_bf16 (r3 path)", bf16_fn, (variables, imgs, eps), False),
        ("int8 stacked acc_f32 (r4 default)", stacked_fn,
         (variables, qd, imgs, eps), True),
        ("int8 stacked acc_bf16 (r3 path)", stacked_fn,
         (variables, qd, imgs, eps), False),
        ("int8 stacked + s2d (serving default)", s2d_fn,
         (variables, qd, imgs, eps), True),
    ]

    loops = []
    for name, fn, args, acc in arms:
        # patch the accumulate policy BEFORE trace: models/swin.py imports
        # mlp_block_fused per call, so the module attribute is what runs
        mb.mlp_block_fused = (orig_mlp if acc else
                              functools.partial(orig_mlp, acc_f32=False))
        loops.append((name, build_loop(fn, args), args))
        mb.mlp_block_fused = orig_mlp
        print(json.dumps({"compiled": name}), flush=True)

    # interleave the repeats across arms so chip/tunnel drift decorrelates
    results = {name: [] for name, _, _ in loops}
    for _ in range(REPEATS):
        for name, loop, args in loops:
            t0 = time.perf_counter()
            float(loop(*args))
            results[name].append((time.perf_counter() - t0) / ITERS)

    for name, _, _ in loops:
        per = results[name]
        best = min(per)
        fps = [batch / s for s in per]
        print(json.dumps({
            "path": name,
            "fps_runs": [round(f, 1) for f in fps],
            "per_step_ms_runs": [round(s * 1e3, 2) for s in per],
            "best_fps": round(batch / best, 1),
            "overhead_subtracted_ms": round(
                (best - overhead / ITERS) * 1e3, 2),
            "overhead_subtracted_fps": round(
                batch / max(best - overhead / ITERS, 1e-9), 1),
        }), flush=True)


if __name__ == "__main__":
    if "--nano" in sys.argv:
        # CPU plumbing check: tiny model, interpret-mode kernels
        main(batch=2, backbone="swin_nano_64", res=64)
    else:
        main()
