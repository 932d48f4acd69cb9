"""Headline benchmark: end-to-end video frames/sec/chip, pixels -> logits.

Runs the flagship deployed model (EndToEndRecognizer: ResNet18 over frames +
causal TCN + all task heads, ONE XLA program — with the fused Pallas TCN
layers) on the real TPU chip at the reference resolution 256x448 in
bfloat16, and prints one JSON line.

Measurement notes (this runtime): ``block_until_ready`` on the axon remote
backend does NOT wait for remote execution (fire-ahead), so naive timing
reads absurdly fast. The loop therefore chains every step's scalar summary
into a device-side accumulator (a real data dependency across all steps)
and reads ONE scalar back at the end — all executions must complete, and
the single host round-trip amortizes away.

``vs_baseline``: the reference publishes no throughput numbers
(BASELINE.md). The driver-supplied target is >=5x an A100 running the
reference's student pipeline; we anchor the A100 estimate at 2500 frames/s
(torch ResNet18 inference @256x448 with the TCN head, mixed precision) and
report value / 2500.0.
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])

import jax
import jax.numpy as jnp

A100_REFERENCE_FPS_ESTIMATE = 2500.0


def main():
    from computervision_codes_tpu.models.pipeline import EndToEndRecognizer

    batch, clip_len = 4, 256  # 4 full 256-frame clips per step
    model = EndToEndRecognizer(dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 4, 256, 448, 3), jnp.bfloat16))

    n_bufs, iters = 2, 20
    stacked = jax.random.normal(
        jax.random.PRNGKey(2), (n_bufs, batch, clip_len, 256, 448, 3),
        jnp.bfloat16)

    @jax.jit
    def bench_fn(v, stacked):
        # the whole timing loop is ONE device program: scan over steps,
        # each consuming a rotating input buffer, chained into a scalar
        def step(acc, i):
            clips = stacked[i % n_bufs]
            out = model.apply(v, clips)["ivt"].astype(jnp.float32).mean()
            return acc + out, None

        total, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(iters))
        return total

    jax.block_until_ready(stacked)
    float(bench_fn(variables, stacked))  # warmup / compile + full round-trip

    start = time.perf_counter()
    checksum = float(bench_fn(variables, stacked))  # one host round-trip
    elapsed = time.perf_counter() - start
    fps = batch * clip_len * iters / elapsed

    print(json.dumps({
        "metric": "video frames/sec/chip pixels->logits (ResNet18+TCN e2e, "
                  "256x448 bf16)",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / A100_REFERENCE_FPS_ESTIMATE, 3),
        "detail": {
            "batch": batch, "clip_len": clip_len, "iters": iters,
            "elapsed_s": round(elapsed, 3), "checksum": round(checksum, 4),
            "baseline_anchor": "A100 reference-student estimate "
                               f"{A100_REFERENCE_FPS_ESTIMATE} fps",
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
