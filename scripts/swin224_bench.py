"""On-chip A/B: 224-resolution Swins (window 7) fused vs XLA eval.

The reference TERL track is 224-first (TERL/6_baseline_learnT/runT.sh,
swin_T_224 default backbone; swin variants
Spatial_transformer/models/swin_transformer.py:596-631). Round 3's fused
kernels excluded odd windows; round 4 runs them at a padded (w+1)^2
in-kernel geometry (ops/window_mhsa.py). This script measures the
model-level win on the real chip.

Run (TPU): python scripts/swin224_bench.py [--batch 32]
"""

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from scripts.swin_roofline import timed_scan


def bench_variant(name: str, batch: int, res: int = 224):
    from computervision_codes_tpu.models.swin import (SwinTransformer,
                                                      VARIANTS)

    cfg = dict(VARIANTS[name]) if name in VARIANTS else dict(
        embed_dim=32, depths=(2, 2), num_heads=(2, 4), window_size=7)
    img = jax.random.normal(jax.random.PRNGKey(1), (batch, res, res, 3),
                            jnp.bfloat16)
    rows = {}
    for fused in (False, True):
        model = SwinTransformer(num_classes=0, fused_eval=fused,
                                dtype=jnp.bfloat16, **cfg)
        v = model.init(jax.random.PRNGKey(0), img[:1])
        s = timed_scan(
            lambda vv, x: model.apply(vv, x)["pooled"].astype(
                jnp.float32).mean(), (v, img), eps_on=1)
        rows[fused] = s
        print(json.dumps({
            "metric": f"{name} eval {'fused' if fused else 'xla'}",
            "fps": round(batch / s, 1), "ms_per_batch": round(s * 1e3, 2),
            "batch": batch}), flush=True)
    print(json.dumps({"metric": f"{name} fused speedup",
                      "x": round(rows[False] / rows[True], 3)}), flush=True)


def main():
    batch = 32
    if "--batch" in sys.argv:
        batch = int(sys.argv[sys.argv.index("--batch") + 1])
    if "--nano" in sys.argv:
        # CPU plumbing check (window-7 nano at 56px, interpret kernels)
        bench_variant("nano_w7", 1, res=56)
        return
    bench_variant("swin_T_224_1k", batch)
    bench_variant("swin_L_224_22k", batch)


if __name__ == "__main__":
    main()
