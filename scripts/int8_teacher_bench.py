"""bf16 vs int8-dense SwinL-384 Q2L teacher throughput on the real chip.

The round-2 ablation (docs/BENCH.md) showed the teacher's time is in its
dense GEMMs (stage3 = 38/72 ms at ~31% MXU) and that attention fusion is a
dead end at Swin window sizes. This measures the other lever: every
calibrated nn.Dense runs int8 on the MXU double-rate path
(models/quant_dense.py), weights per-channel, static activation scales.

Run (TPU, single process!): python scripts/int8_teacher_bench.py
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


def timed(fn, args, iters=5, frames=16):
    @jax.jit
    def loop(*a):
        eps = a[-1]

        def step(acc, i):
            return acc + fn(*a[:-1], eps[i]), None

        total, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(iters))
        return total

    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    dt = (time.perf_counter() - t0) / iters
    return frames / dt, dt


def main(batch=16):
    from computervision_codes_tpu.models.q2l import Q2L
    from computervision_codes_tpu.models.quant_dense import (
        collect_dense_scales,
        int8_apply,
        quantize_dense_params,
    )

    rng = jax.random.PRNGKey(0)
    imgs = jax.random.normal(rng, (batch, 384, 384, 3), jnp.bfloat16)
    eps = (jax.random.normal(rng, (8,), jnp.float32) * 0.01).astype(
        jnp.bfloat16)

    model = Q2L(backbone="swin_L_384_22k", loss_type="i", dtype=jnp.bfloat16)
    variables = model.init(rng, imgs[:1])

    fps_f, ms_f = timed(
        lambda v, x, e: model.apply(v, x + e)["logits"]["i"].astype(
            jnp.float32).mean(), (variables, imgs, eps), frames=batch)
    print(json.dumps({"path": "bf16", "fps": round(fps_f, 1),
                      "per_step_ms": round(ms_f * 1e3, 2)}))

    scales = collect_dense_scales(model, variables, imgs[:2])
    qd = quantize_dense_params(variables)
    print(json.dumps({"calibrated_dense_layers": len(scales)}))

    for minf in (0, 512):
        fps_q, ms_q = timed(
            lambda v, q, x, e: int8_apply(
                model, v, q, scales, x + e, min_features=minf
            )["logits"]["i"].astype(jnp.float32).mean(),
            (variables, qd, imgs, eps), frames=batch)
        print(json.dumps({"path": f"int8 dense (min_features={minf})",
                          "fps": round(fps_q, 1),
                          "per_step_ms": round(ms_q * 1e3, 2),
                          "speedup_vs_bf16": round(fps_q / fps_f, 3)}))

    # the round-3 serving config: in-kernel int8 GEMMs inside the fused
    # Swin kernels (quant_eval — stage 3/4) STACKED with the dense
    # interception for everything the fused kernels don't cover (decoder
    # FFN-8192, stage-4 XLA attention, patch merges)
    qmodel = Q2L(backbone="swin_L_384_22k", loss_type="i",
                 dtype=jnp.bfloat16, quant_eval=True)
    # round 4: + space-to-depth patch embed (exact GEMM reparam)
    qmodel_s2d = Q2L(backbone="swin_L_384_22k", loss_type="i",
                     dtype=jnp.bfloat16, quant_eval=True, s2d_embed=True)
    fps_s, ms_s = timed(
        lambda v, q, x, e: int8_apply(
            qmodel, v, q, scales, x + e, min_features=512
        )["logits"]["i"].astype(jnp.float32).mean(),
        (variables, qd, imgs, eps), frames=batch)
    print(json.dumps({"path": "int8 stacked (quant_eval + dense>=512)",
                      "fps": round(fps_s, 1),
                      "per_step_ms": round(ms_s * 1e3, 2),
                      "speedup_vs_bf16": round(fps_s / fps_f, 3)}))

    fps_sd, ms_sd = timed(
        lambda v, q, x, e: int8_apply(
            qmodel_s2d, v, q, scales, x + e, min_features=512
        )["logits"]["i"].astype(jnp.float32).mean(),
        (variables, qd, imgs, eps), frames=batch)
    print(json.dumps({"path": "int8 stacked + s2d patch embed",
                      "fps": round(fps_sd, 1),
                      "per_step_ms": round(ms_sd * 1e3, 2),
                      "speedup_vs_stacked": round(fps_sd / fps_s, 3)}))


if __name__ == "__main__":
    main()
