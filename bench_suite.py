"""Per-stage benchmark suite (the 5 BASELINE.json configs) on the real TPU.

Prints one JSON line per config. bench.py remains the single-line headline
bench the driver consumes; this suite is for engineering visibility.

Methodology: chained lax.scan with per-step-distinct inputs and a single
scalar readback (see docs/BENCH.md — block_until_ready is fire-ahead on
this runtime and same-input scans get hoisted).
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0])

import jax
import jax.numpy as jnp


_BASELINE = [None]


def timed_scan(apply_fn, variables, base, eps, iters=20):
    """Round-3 methodology: the fixed ~25 ms dispatch/tunnel overhead is
    measured once with an empty loop and subtracted (docs/BENCH.md)."""
    @jax.jit
    def loop(v, base, eps):
        def step(acc, i):
            return acc + apply_fn(v, base + eps[i % eps.shape[0]]), None

        total, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(iters))
        return total

    if _BASELINE[0] is None:
        _BASELINE[0] = 0.0
        z = jnp.zeros((8, 8), jnp.bfloat16)
        # the overhead is per-INVOCATION, so the constant is the empty
        # loop's TOTAL elapsed: per-iter x its OWN iters (pinned), not the
        # first caller's iters (ADVICE r3 — reordering rows mis-scaled it)
        _BASELINE[0] = max(0.0, timed_scan(
            lambda v, x: x.astype(jnp.float32).mean(), None, z,
            jnp.zeros((8,), jnp.bfloat16), iters=20) * 20)
    float(loop(variables, base, eps))  # compile + warm
    t0 = time.perf_counter()
    float(loop(variables, base, eps))
    return max(1e-9, time.perf_counter() - t0 - _BASELINE[0]) / iters


def report(name, frames, secs, detail=None):
    print(json.dumps({
        "metric": name, "value": round(frames / secs, 1),
        "unit": "frames/sec/chip", "per_step_ms": round(secs * 1000, 2),
        "detail": detail or {},
    }))


def main():
    rng = jax.random.PRNGKey(0)
    eps32 = jax.random.normal(rng, (16,), jnp.float32) * 0.01
    eps16 = eps32.astype(jnp.bfloat16)

    # 1) TERL/tenco TCN over cached features: full 6k-frame video
    from computervision_codes_tpu.models.tcn import TemporalTCN

    tcn = TemporalTCN(dtype=jnp.bfloat16, channel_dropout=0.0)
    feats = jax.random.normal(rng, (1, 6144, 512), jnp.bfloat16)
    tv = tcn.init(rng, feats[:, :128])
    s = timed_scan(lambda v, x: jnp.asarray(
        tcn.apply(v, x)["ivt"][0], jnp.float32).mean(), tv, feats, eps16)
    report("TCN full-video 6144 frames (feats->logits)", 6144, s)

    # 2) spatial student: ResNet18 frame inference 256x448
    from computervision_codes_tpu.models.spatial_cnn import SpatialCNN

    student = SpatialCNN(network="resnet18", loss_type="ivt",
                         dtype=jnp.bfloat16)
    imgs = jax.random.normal(rng, (256, 256, 448, 3), jnp.bfloat16)
    sv = student.init(rng, imgs[:2])
    s = timed_scan(lambda v, x: student.apply(v, x)["logits"]["ivt"].astype(
        jnp.float32).mean(), sv, imgs, eps16)
    report("Spatial_cnn ResNet18 frame inference 256x448", 256, s)

    # 3) Swin-L/384 Q2L teacher, batched frames (the heavy teacher)
    from computervision_codes_tpu.models.q2l import Q2L

    q2l = Q2L(backbone="swin_L_384_22k", loss_type="i", dtype=jnp.bfloat16)
    imgs = jax.random.normal(rng, (16, 384, 384, 3), jnp.bfloat16)
    qv = q2l.init(rng, imgs[:1])
    s = timed_scan(lambda v, x: q2l.apply(v, x)["logits"]["i"].astype(
        jnp.float32).mean(), qv, imgs, eps16, iters=8)
    report("Spatial_transformer SwinL-384 Q2L teacher inference", 16, s)

    # 4) MS-TCT over a full video (2048 frames, 1536-d feats)
    from computervision_codes_tpu.models.mstct import MSTCT

    mstct = MSTCT(dtype=jnp.bfloat16, num_classes=6)
    feats = jax.random.normal(rng, (1, 2048, 1536), jnp.bfloat16)
    mv = mstct.init(rng, feats[:, :256])
    s = timed_scan(lambda v, x: mstct.apply(v, x)["logits"].astype(
        jnp.float32).mean(), mv, feats, eps16, iters=8)
    report("Temporal_mstct full-video 2048 frames (Pallas attention)", 2048, s)

    # 5) headline e2e (same as bench.py config)
    from computervision_codes_tpu.models.pipeline import EndToEndRecognizer

    e2e = EndToEndRecognizer(dtype=jnp.bfloat16)
    clips = jax.random.normal(rng, (4, 256, 256, 448, 3), jnp.bfloat16)
    ev = e2e.init(rng, clips[:1, :4])
    s = timed_scan(lambda v, x: e2e.apply(v, x)["ivt"].astype(
        jnp.float32).mean(), ev, clips, eps16, iters=8)
    report("Full student e2e pixels->logits (4x256 frames)", 4 * 256, s)


if __name__ == "__main__":
    main()
