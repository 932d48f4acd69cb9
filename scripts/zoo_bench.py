"""Backbone-zoo inference on the real TPU chip: CvT-13 and TResNet-M.

These two zoo members (M10/M11) are forward-parity-tested against torch on
CPU but otherwise only exercised at smoke scale — this runs them at their
reference resolutions on the chip (TResNet drives the Pallas fused-ABN /
blur-pool / space-to-depth kernels through Mosaic, which interpret-mode
tests cannot cover) and records throughput next to the other stages.

Run (TPU, single process!): python scripts/zoo_bench.py
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


_BASELINE = [None]


def timed_scan(apply_fn, variables, base, eps, iters=20):
    """Chained scan with the fixed ~25 ms dispatch overhead subtracted
    (round-3 methodology, see docs/BENCH.md measurement correction)."""
    @jax.jit
    def loop(v, base, eps):
        def step(acc, i):
            return acc + apply_fn(v, base + eps[i % eps.shape[0]]), None

        total, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(iters))
        return total

    if _BASELINE[0] is None:
        _BASELINE[0] = 0.0
        z = jnp.zeros((8, 8), jnp.bfloat16)
        # per-INVOCATION constant: per-iter x the empty loop's OWN iters
        # (pinned 20), not the first caller's (ADVICE r3)
        _BASELINE[0] = max(0.0, timed_scan(
            lambda v, x: x.astype(jnp.float32).mean(), None, z,
            jnp.zeros((8,), jnp.bfloat16), iters=20) * 20)
    float(loop(variables, base, eps))
    t0 = time.perf_counter()
    float(loop(variables, base, eps))
    return max(1e-9, time.perf_counter() - t0 - _BASELINE[0]) / iters


def main(batch=32):
    from computervision_codes_tpu.models.cvt import build_cvt
    from computervision_codes_tpu.models.tresnet import build_tresnet

    rng = jax.random.PRNGKey(0)
    eps = (jax.random.normal(rng, (8,), jnp.float32) * 0.01).astype(
        jnp.bfloat16)
    imgs = jax.random.normal(rng, (batch, 224, 224, 3), jnp.bfloat16)

    cvt = build_cvt("cvt_13", dtype=jnp.bfloat16)
    cv = cvt.init(rng, imgs[:1])
    s = timed_scan(lambda v, x: cvt.apply(v, x, train=False)[
        "pooled"].astype(jnp.float32).mean(), cv, imgs, eps)
    print(json.dumps({"metric": f"CvT-13 backbone 224 (b={batch})",
                      "fps": round(batch / s, 1),
                      "per_step_ms": round(s * 1e3, 2)}))

    tres = build_tresnet("tresnet_m", dtype=jnp.bfloat16)
    tv = tres.init(rng, imgs[:1])

    def tres_fwd(v, x):
        out = tres.apply(v, x, train=False)
        pooled = out["pooled"] if isinstance(out, dict) else out
        return pooled.astype(jnp.float32).mean()

    s = timed_scan(tres_fwd, tv, imgs, eps)
    print(json.dumps({"metric": f"TResNet-M backbone 224 (b={batch}, "
                                "Pallas ABN/blur-pool/s2d kernels)",
                      "fps": round(batch / s, 1),
                      "per_step_ms": round(s * 1e3, 2)}))

    # int8-PTQ TResNet (round 3 — per-conv gains measured 1.1-4.0x,
    # scripts/stem_probe.py; CvT int8 is a recorded NEGATIVE: its patch
    # convs run 0.34-0.52x in int8 and dw projections are a wash)
    from computervision_codes_tpu.models.quant_tresnet import (
        make_int8_tresnet)

    fn, qp = make_int8_tresnet("tresnet_m", tv,
                               calibrate_frames=np.asarray(imgs[:4]))
    s = timed_scan(lambda q, x: fn(q, x)["pooled"].astype(
        jnp.float32).mean(), qp, imgs, eps)
    print(json.dumps({"metric": f"TResNet-M backbone 224 int8-PTQ "
                                f"(b={batch}, calibrated static scales)",
                      "fps": round(batch / s, 1),
                      "per_step_ms": round(s * 1e3, 2)}))


if __name__ == "__main__":
    main()
