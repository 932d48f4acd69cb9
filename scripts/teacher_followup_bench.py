"""Round-4 teacher follow-ups: stage-2 quant gate A/B + serving smoke.

Two VERDICT-r3 items the main queue missed:

1. ``quant_min_dim`` A/B — the int8 quant_eval gate currently quantizes
   stage dims >= 768 (stage 3/4). The stage-2 merged-kernel quant path
   (ops/swin_block quant mode) lowers that to 384; measure whether it
   wins end-to-end.
2. Real-size ``TeacherSession(quantize=True)`` smoke — confirm the int8
   stack reproduces through the SERVING surface (session-compiled fn,
   uint8 frames + on-device normalize), not just the raw model apply.

Run (TPU, single process!): python scripts/teacher_followup_bench.py
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


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


def quant_gate_ab(batch=16):
    from computervision_codes_tpu.models.q2l import Q2L
    from computervision_codes_tpu.models.quant_dense import (
        collect_dense_scales, int8_apply, quantize_dense_params)

    rng = jax.random.PRNGKey(0)
    imgs = jax.random.normal(rng, (batch, 384, 384, 3), jnp.bfloat16)
    eps = (jax.random.normal(rng, (8,), jnp.float32) * 0.01).astype(
        jnp.bfloat16)
    ref = Q2L(backbone="swin_L_384_22k", loss_type="i", dtype=jnp.bfloat16)
    variables = ref.init(rng, imgs[:1])
    scales = collect_dense_scales(ref, variables, imgs[:2])
    qd = quantize_dense_params(variables)

    base = None
    for mind in (768, 384):
        qmodel = Q2L(backbone="swin_L_384_22k", loss_type="i",
                     dtype=jnp.bfloat16, quant_eval=True,
                     quant_min_dim=mind, s2d_embed=True)
        fps, ms = timed(
            lambda v, q, x, e: int8_apply(
                qmodel, v, q, scales, x + e, min_features=512
            )["logits"]["i"].astype(jnp.float32).mean(),
            (variables, qd, imgs, eps), frames=batch)
        row = {"path": f"int8 stacked + s2d (quant_min_dim={mind})",
               "fps": round(fps, 1), "per_step_ms": round(ms * 1e3, 2)}
        if base is None:
            base = fps
        else:
            row["speedup_vs_768"] = round(fps / base, 3)
        print(json.dumps(row), flush=True)


def session_smoke(batch=16):
    from computervision_codes_tpu.serving import TeacherSession

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (batch, 384, 384, 3)).astype(np.uint8)
    for quantize in (False, True):
        t0 = time.perf_counter()
        sess = TeacherSession.create(batch=batch, quantize=quantize)
        build_s = time.perf_counter() - t0
        out = sess.predict(frames)  # compile + run
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            out = sess.predict(frames)
        dt = (time.perf_counter() - t0) / iters
        probs = out["i"]
        print(json.dumps({
            "path": f"TeacherSession(quantize={quantize}) b={batch} smoke",
            "build_s": round(build_s, 1),
            "fps_serving_surface": round(batch / dt, 1),
            "note": "per-call host round-trip included (fire-ahead "
                    "runtime: treat as lower bound)",
            "probs_finite": bool(np.isfinite(probs).all()),
            "probs_in_01": bool((probs >= 0).all() and (probs <= 1).all()),
            "feature_dim": int(out["feature"].shape[-1]),
        }), flush=True)


if __name__ == "__main__":
    quant_gate_ab()
    session_smoke()
