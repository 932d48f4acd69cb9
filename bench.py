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
import os
import subprocess
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])

A100_REFERENCE_FPS_ESTIMATE = 2500.0

# transient-infrastructure signatures worth a backoff+retry (the axon TPU
# tunnel drops and recovers: BENCH_r03 died on one 'UNAVAILABLE' at init)
_RETRYABLE = ("UNAVAILABLE", "DEADLINE_EXCEEDED", "Unable to initialize",
              "Connection", "Socket closed", "unreachable", "RESOURCE_EXHAUSTED",
              "timed out")


def _supervise(attempts: int = 3, child_timeout: int = 900) -> int:
    """Run the bench body in child processes with bounded retries.

    A fresh process per attempt is REQUIRED: jax caches a failed backend
    init for the life of the process, and a dead tunnel can also make the
    first device call hang forever (hence the per-attempt timeout). On
    success the child's stdout (one JSON line) is relayed verbatim; after
    exhausting retries a diagnostic JSON line is still emitted so the
    round's record carries the failure cause rather than a bare rc.
    """
    env = dict(os.environ, GRAFT_BENCH_CHILD="1")
    last_tail, backoff = "", 30
    for attempt in range(attempts):
        # cheap device probe first: a dead tunnel HANGS at backend init
        # (never errors), so burning child_timeout per attempt on the full
        # bench would take ~45 min to report — the probe bounds that to
        # ~2 min per attempt
        try:
            probe = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                env=os.environ, capture_output=True, text=True, timeout=150)
            probe_ok = probe.returncode == 0
            probe_tail = (probe.stderr or "")[-1500:]
        except subprocess.TimeoutExpired:
            probe_ok = False
            probe_tail = "device probe hung > 150s (tunnel down)"
        if not probe_ok:
            last_tail = f"attempt {attempt + 1}: {probe_tail}"
            time.sleep(backoff)
            backoff *= 2
            continue
        try:
            proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                  env=env, capture_output=True, text=True,
                                  timeout=child_timeout)
        except subprocess.TimeoutExpired:
            last_tail = f"attempt {attempt + 1}: hung > {child_timeout}s " \
                        "(tunnel hang) — killed"
            time.sleep(backoff)
            backoff *= 2
            continue
        line = next((ln for ln in proc.stdout.splitlines()
                     if ln.startswith("{")), None)
        if proc.returncode == 0 and line:
            print(line)
            return 0
        last_tail = (proc.stderr or proc.stdout or "")[-2000:]
        if not any(sig in last_tail for sig in _RETRYABLE):
            break  # deterministic failure — retrying would just burn budget
        time.sleep(backoff)
        backoff *= 2
    print(json.dumps({
        "metric": "video frames/sec/chip pixels->logits (ResNet18+TCN e2e, "
                  "256x448, int8-PTQ backbone + bf16 TCN)",
        "value": 0.0, "unit": "frames/sec/chip", "vs_baseline": 0.0,
        "error": f"bench failed after {attempts} attempts",
        "error_tail": last_tail[-600:],
    }))
    return 1


import jax
import jax.numpy as jnp


def _chained_fps(apply_fn, variables, stacked, batch, clip_len, n_bufs,
                 iters):
    @jax.jit
    def bench_fn(v, stacked):
        # the whole timing loop is ONE device program: scan over steps,
        # each consuming a rotating input buffer, chained into a scalar
        def step(acc, i):
            clips = stacked[i % n_bufs]
            out = apply_fn(v, clips)["ivt"].astype(jnp.float32).mean()
            return acc + out, None

        total, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(iters))
        return total

    float(bench_fn(variables, stacked))  # warmup / compile + full round-trip
    start = time.perf_counter()
    checksum = float(bench_fn(variables, stacked))  # one host round-trip
    elapsed = time.perf_counter() - start
    return batch * clip_len * iters / elapsed, elapsed, checksum


def main():
    from computervision_codes_tpu.models.pipeline import EndToEndRecognizer
    from computervision_codes_tpu.models.quantized import make_int8_e2e

    batch, clip_len = 4, 256  # 4 full 256-frame clips per step
    model = EndToEndRecognizer(dtype=jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 4, 256, 448, 3), jnp.bfloat16))

    n_bufs, iters = 2, 20
    stacked = jax.random.normal(
        jax.random.PRNGKey(2), (n_bufs, batch, clip_len, 256, 448, 3),
        jnp.bfloat16)
    jax.block_until_ready(stacked)

    fps_bf16, _, _ = _chained_fps(lambda v, c: model.apply(v, c), variables,
                                  stacked, batch, clip_len, n_bufs, iters)

    # the deployed serving config: int8-PTQ backbone with calibrated static
    # activation scales + bf16 TCN (models/quantized.py; accuracy-guarded
    # by tests/test_quantized.py — logits corr > 0.98 vs float)
    fn, qvars = make_int8_e2e(model, variables,
                              calibrate_clips=stacked[0, :1, :32])
    fps, elapsed, checksum = _chained_fps(fn, qvars, stacked, batch,
                                          clip_len, n_bufs, iters)

    print(json.dumps({
        "metric": "video frames/sec/chip pixels->logits (ResNet18+TCN e2e, "
                  "256x448, int8-PTQ backbone + bf16 TCN)",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        # vs_baseline IS the int8 serving config; vs_baseline_bf16 is the
        # precision-matched (like-for-like vs the fp16/fp32 torch anchor)
        # ratio (ADVICE r2; the redundant _int8 alias dropped, ADVICE r3)
        "vs_baseline": round(fps / A100_REFERENCE_FPS_ESTIMATE, 3),
        "vs_baseline_bf16": round(fps_bf16 / A100_REFERENCE_FPS_ESTIMATE, 3),
        "detail": {
            "batch": batch, "clip_len": clip_len, "iters": iters,
            "elapsed_s": round(elapsed, 3), "checksum": round(checksum, 4),
            "bf16_fps": round(fps_bf16, 1),
            "int8_speedup": round(fps / fps_bf16, 3),
            "baseline_anchor": "A100 reference-student estimate "
                               f"{A100_REFERENCE_FPS_ESTIMATE} fps",
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    if os.environ.get("GRAFT_BENCH_CHILD"):
        main()
    else:
        sys.exit(_supervise())
