"""Headline benchmark: end-to-end video frames/sec/chip, pixels -> logits.

Runs the flagship deployed model (EndToEndRecognizer: ResNet18 over frames +
causal TCN + all task heads, ONE XLA program) on the real TPU chip at the
reference resolution 256x448 in bfloat16, and prints one JSON line.

``vs_baseline``: the reference publishes no throughput numbers
(BASELINE.md). The driver-supplied target is >=5x an A100 running the
reference's student pipeline; we anchor the A100 estimate at 2500 frames/s
(torch ResNet18 inference @256x448 with the TCN head, mixed precision) and
report value / 2500.0. The JSON also carries the raw numbers.
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

    batch, clip_len = 4, 64  # 256 frames per step
    model = EndToEndRecognizer(dtype=jnp.bfloat16)
    # random data — all-zeros input measured ~40x too fast on this runtime
    clips = jax.random.normal(jax.random.PRNGKey(1),
                              (batch, clip_len, 256, 448, 3), jnp.bfloat16)
    variables = model.init(jax.random.PRNGKey(0), clips[:1, :4])

    @jax.jit
    def forward(variables, clips):
        return model.apply(variables, clips)["ivt"]

    # distinct input buffers (this runtime short-circuits repeated identical
    # executions, which would fake the timing)
    inputs = [
        jax.random.normal(jax.random.PRNGKey(i + 2),
                          (batch, clip_len, 256, 448, 3), jnp.bfloat16)
        for i in range(5)
    ]
    # warmup / compile
    forward(variables, inputs[0]).block_until_ready()
    forward(variables, inputs[1]).block_until_ready()

    iters = 20
    start = time.perf_counter()
    outs = [forward(variables, inputs[i % len(inputs)]) for i in range(iters)]
    for o in outs:
        o.block_until_ready()
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
            "elapsed_s": round(elapsed, 3),
            "baseline_anchor": "A100 reference-student estimate "
                               f"{A100_REFERENCE_FPS_ESTIMATE} fps",
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
