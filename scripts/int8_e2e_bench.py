"""bf16 vs int8-backbone e2e student throughput on the real TPU chip.

Same model/shape/methodology as bench.py (EndToEndRecognizer, 4x256-frame
clips at 256x448, chained-scan timing); the int8 path quantizes the ResNet18
backbone per models/quantized.py and keeps the TCN in bf16.

Run (TPU, single process!): python scripts/int8_e2e_bench.py
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


def chained(fn, args, n_bufs, iters, batch_frames):
    @jax.jit
    def loop(*a):
        stacked = a[-1]

        def step(acc, i):
            out = fn(*a[:-1], stacked[i % n_bufs])
            return acc + out["ivt"].astype(jnp.float32).mean(), None

        total, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(iters))
        return total

    float(loop(*args))
    t0 = time.perf_counter()
    chk = float(loop(*args))
    dt = time.perf_counter() - t0
    return batch_frames * iters / dt, chk


def main():
    from computervision_codes_tpu.models.pipeline import EndToEndRecognizer
    from computervision_codes_tpu.models.quantized import make_int8_e2e

    batch, clip_len, n_bufs, iters = 4, 256, 2, 20
    model = EndToEndRecognizer(dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 4, 256, 448, 3), jnp.bfloat16))
    stacked = jax.random.normal(
        jax.random.PRNGKey(2), (n_bufs, batch, clip_len, 256, 448, 3),
        jnp.bfloat16)
    jax.block_until_ready(stacked)

    fps_f, chk_f = chained(lambda v, x: model.apply(v, x),
                           (variables, stacked), n_bufs, iters,
                           batch * clip_len)
    print(json.dumps({"path": "bf16", "fps": round(fps_f, 1),
                      "checksum": round(chk_f, 4)}))

    # round 4: bf16 arm with the fused Pallas stem (BN trace-folded)
    model_fs = EndToEndRecognizer(dtype=jnp.bfloat16, fused_stem=True)
    fps_ffs, chk_ffs = chained(lambda v, x: model_fs.apply(v, x),
                               (variables, stacked), n_bufs, iters,
                               batch * clip_len)
    print(json.dumps({"path": "bf16 + FUSED stem+pool kernel",
                      "fps": round(fps_ffs, 1),
                      "checksum": round(chk_ffs, 4),
                      "speedup_vs_bf16": round(fps_ffs / fps_f, 3)}))

    fn, qvars = make_int8_e2e(model, variables)
    fps_q, chk_q = chained(fn, (qvars, stacked), n_bufs, iters,
                           batch * clip_len)
    print(json.dumps({"path": "int8 dynamic-scale",
                      "fps": round(fps_q, 1), "checksum": round(chk_q, 4),
                      "speedup_vs_bf16": round(fps_q / fps_f, 3)}))

    fn_s, qvars_s = make_int8_e2e(model, variables,
                                  calibrate_clips=stacked[0, :1, :32])
    fps_s, chk_s = chained(fn_s, (qvars_s, stacked), n_bufs, iters,
                           batch * clip_len)
    print(json.dumps({"path": "int8 static-scale (calibrated)",
                      "fps": round(fps_s, 1), "checksum": round(chk_s, 4),
                      "speedup_vs_bf16": round(fps_s / fps_f, 3)}))

    # round 4: space-to-depth stem execution plan (same math, C_in 3->12)
    fn_sd, qvars_sd = make_int8_e2e(model, variables,
                                    calibrate_clips=stacked[0, :1, :32],
                                    s2d_stem=True)
    fps_sd, chk_sd = chained(fn_sd, (qvars_sd, stacked), n_bufs, iters,
                             batch * clip_len)
    print(json.dumps({"path": "int8 static + s2d stem",
                      "fps": round(fps_sd, 1), "checksum": round(chk_sd, 4),
                      "speedup_vs_static": round(fps_sd / fps_s, 3)}))

    # round 4: fused Pallas stem+maxpool (ops/stem_pool)
    fn_fs, qvars_fs = make_int8_e2e(model, variables,
                                    calibrate_clips=stacked[0, :1, :32],
                                    fused_stem=True)
    fps_fs, chk_fs = chained(fn_fs, (qvars_fs, stacked), n_bufs, iters,
                             batch * clip_len)
    print(json.dumps({"path": "int8 static + FUSED stem+pool kernel",
                      "fps": round(fps_fs, 1), "checksum": round(chk_fs, 4),
                      "speedup_vs_static": round(fps_fs / fps_s, 3)}))


if __name__ == "__main__":
    main()
