"""SwinL-384 Q2L teacher component ablation on the real TPU chip.

Times the pieces of the heavy teacher (BENCH.md row 3) to locate the
bottleneck before optimizing: full model, backbone alone, Q2L head alone,
per-stage Swin stacks, window attention with fp32 vs bf16 softmax, and
batch scaling. Uses the chained-scan methodology (docs/BENCH.md) — the
axon block_until_ready is fire-ahead and same-input scans get hoisted.

Run (TPU, single process!): python scripts/swin_ablation.py
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


_BASELINE = [None]


def timed_scan(apply_fn, variables, base, eps, iters=20):
    """Chained-scan timing with the fixed dispatch/tunnel overhead
    (~25-30 ms/call, measured via an empty loop) subtracted — at the old
    iters=5 without subtraction every row was inflated ~5.5 ms."""
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


def report(name, frames, secs):
    print(json.dumps({"metric": name, "fps": round(frames / secs, 1),
                      "per_step_ms": round(secs * 1000, 2)}))


def main(batch=16, skip_base=False):
    from computervision_codes_tpu.models.q2l import Q2L
    from computervision_codes_tpu.models.swin import SwinTransformer, VARIANTS

    rng = jax.random.PRNGKey(0)
    eps = (jax.random.normal(rng, (8,), jnp.float32) * 0.01).astype(jnp.bfloat16)

    cfg = VARIANTS["swin_L_384_22k"]
    imgs = jax.random.normal(rng, (batch, 384, 384, 3), jnp.bfloat16)

    swin = SwinTransformer(dtype=jnp.bfloat16, **cfg)
    sv = swin.init(rng, imgs[:1])

    if not skip_base:
        # 1) full Q2L teacher (the BENCH row)
        q2l = Q2L(backbone="swin_L_384_22k", loss_type="i",
                  dtype=jnp.bfloat16)
        qv = q2l.init(rng, imgs[:1])
        s = timed_scan(lambda v, x: q2l.apply(v, x)["logits"]["i"].astype(
            jnp.float32).mean(), qv, imgs, eps)
        report(f"Q2L SwinL-384 full (b={batch})", batch, s)

        # 2) backbone alone
        s = timed_scan(lambda v, x: swin.apply(v, x)["pooled"].astype(
            jnp.float32).mean(), sv, imgs, eps)
        report(f"SwinL backbone alone (b={batch})", batch, s)

        # 3) per-stage stacks: truncate depths progressively
        for stages in (1, 2, 3):
            cfg_t = dict(cfg)
            cfg_t["depths"] = cfg["depths"][:stages]
            cfg_t["num_heads"] = cfg["num_heads"][:stages]
            m = SwinTransformer(dtype=jnp.bfloat16, **cfg_t)
            mv = m.init(rng, imgs[:1])
            s = timed_scan(lambda v, x, m=m: m.apply(v, x)["pooled"].astype(
                jnp.float32).mean(), mv, imgs, eps)
            report(f"SwinL stages 1..{stages} (b={batch})", batch, s)

        # 4) batch scaling on the full teacher
        for b2 in (32,):
            imgs2 = jax.random.normal(rng, (b2, 384, 384, 3), jnp.bfloat16)
            s = timed_scan(lambda v, x: q2l.apply(v, x)["logits"]["i"].astype(
                jnp.float32).mean(), qv, imgs2, eps)
            report(f"Q2L SwinL-384 full (b={b2})", b2, s)

    # 5) multi-window fused attention kernel vs XLA (same params)
    for g in (2, 4, 8, 16):
        fused = SwinTransformer(dtype=jnp.bfloat16, use_fused_attn=True,
                                fused_block=g, **cfg)
        try:
            s = timed_scan(lambda v, x, m=fused: m.apply(v, x)[
                "pooled"].astype(jnp.float32).mean(), sv, imgs, eps)
        except Exception as e:  # e.g. VMEM OOM at large G
            print(json.dumps({"metric": f"fused-attn G={g}",
                              "error": str(e).split("\n")[0][:160]}))
            continue
        report(f"SwinL backbone fused-attn G={g} (b={batch})", batch, s)


if __name__ == "__main__":
    main(skip_base="--skip_base" in sys.argv)
