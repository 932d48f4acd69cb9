"""On-chip parity + timing for the fused window-MHSA half-block kernel.

Run (TPU): python scripts/swin_fused_bench.py
"""

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from scripts.swin_roofline import timed_scan, report
from computervision_codes_tpu.ops.window_mhsa import (
    window_mhsa_fused,
    window_mhsa_reference,
)
from computervision_codes_tpu.models.swin import (_relative_position_index,
                                                  _shift_attn_mask)


def run_stage(name, b, hw, c, heads, w=12, shifted=False):
    rng = jax.random.PRNGKey(0)
    n = w * w
    x = jax.random.normal(rng, (b, hw, hw, c), jnp.bfloat16)
    gamma = jnp.ones((c,), jnp.float32)
    beta = jnp.zeros((c,), jnp.float32) + 0.01
    wqkv = (jax.random.normal(rng, (c, 3 * c)) * (c ** -0.5)).astype(
        jnp.bfloat16)
    bqkv = (jax.random.normal(rng, (3 * c,)) * 0.01).astype(jnp.bfloat16)
    wproj = (jax.random.normal(rng, (c, c)) * (c ** -0.5)).astype(
        jnp.bfloat16)
    bproj = (jax.random.normal(rng, (c,)) * 0.01).astype(jnp.bfloat16)
    table = jax.random.normal(rng, ((2 * w - 1) ** 2, heads)) * 0.02
    idx = _relative_position_index(w).reshape(-1)
    bias = table[idx].reshape(n, n, heads).transpose(2, 0, 1).astype(
        jnp.bfloat16)
    mask = jnp.asarray(_shift_attn_mask(hw, hw, w, w // 2)) if shifted \
        else None

    kw = dict(window=w, num_heads=heads)
    # NB: everything must be jitted — eager ops on the axon remote backend
    # cost ~30 ms dispatch EACH (an eager parity diff took 114 s)
    @jax.jit
    def parity(x, bias, mask):
        got = window_mhsa_fused(x, gamma, beta, wqkv, bqkv, wproj, bproj,
                                bias, mask, **kw)
        want = window_mhsa_reference(x, gamma, beta, wqkv, bqkv, wproj,
                                     bproj, bias, mask, **kw)
        return jnp.max(jnp.abs(got.astype(jnp.float32)
                               - want.astype(jnp.float32)))

    err = float(parity(x, bias, mask))
    s = timed_scan(lambda x: window_mhsa_fused(
        x, gamma, beta, wqkv, bqkv, wproj, bproj, bias, mask,
        **kw).astype(jnp.float32).mean(), (x,))
    s_ref = timed_scan(lambda x: window_mhsa_reference(
        x, gamma, beta, wqkv, bqkv, wproj, bproj, bias, mask,
        **kw).astype(jnp.float32).mean(), (x,))
    print(json.dumps({
        "metric": f"fused window-MHSA {name}"
                  f"{' shifted' if shifted else ''}",
        "max_abs_err": round(err, 5),
        "fused_ms": round(s * 1e3, 3),
        "xla_ms": round(s_ref * 1e3, 3),
        "speedup": round(s_ref / s, 2),
    }), flush=True)


def run_mlp(name, b, hw, c):
    from computervision_codes_tpu.ops.mlp_block import (mlp_block_fused,
                                                       mlp_block_reference)

    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (b, hw, hw, c), jnp.bfloat16)
    gamma = jnp.ones((c,), jnp.float32)
    beta = jnp.zeros((c,), jnp.float32) + 0.01
    w1 = (jax.random.normal(rng, (c, 4 * c)) * (c ** -0.5)).astype(
        jnp.bfloat16)
    b1 = (jax.random.normal(rng, (4 * c,)) * 0.01).astype(jnp.bfloat16)
    w2 = (jax.random.normal(rng, (4 * c, c)) * ((4 * c) ** -0.5)).astype(
        jnp.bfloat16)
    b2 = (jax.random.normal(rng, (c,)) * 0.01).astype(jnp.bfloat16)

    @jax.jit
    def parity(x):
        got = mlp_block_fused(x, gamma, beta, w1, b1, w2, b2)
        want = mlp_block_reference(x, gamma, beta, w1, b1, w2, b2)
        return jnp.max(jnp.abs(got.astype(jnp.float32)
                               - want.astype(jnp.float32)))

    err = float(parity(x))
    s = timed_scan(lambda x: mlp_block_fused(
        x, gamma, beta, w1, b1, w2, b2).astype(jnp.float32).mean(), (x,))
    s_ref = timed_scan(lambda x: mlp_block_reference(
        x, gamma, beta, w1, b1, w2, b2).astype(jnp.float32).mean(), (x,))
    print(json.dumps({
        "metric": f"fused MLP half-block {name}",
        "max_abs_err": round(err, 5),
        "fused_ms": round(s * 1e3, 3),
        "xla_ms": round(s_ref * 1e3, 3),
        "speedup": round(s_ref / s, 2),
    }), flush=True)


def run_block(name, b, hw, c, heads, w=12, shifted=False):
    """Merged single-kernel block (ops/swin_block) vs the two split
    kernels run back-to-back (the round-3 shipped configuration)."""
    from computervision_codes_tpu.models.swin import _shift_attn_mask
    from computervision_codes_tpu.ops.mlp_block import mlp_block_fused
    from computervision_codes_tpu.ops.swin_block import (swin_block_fused,
                                                         swin_block_reference)

    rng = jax.random.PRNGKey(2)
    n = w * w
    x = jax.random.normal(rng, (b, hw, hw, c), jnp.bfloat16)
    f = lambda *s: (jax.random.normal(rng, s) * (s[0] ** -0.5)).astype(
        jnp.bfloat16)
    attn = (jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32) + .01,
            f(c, 3 * c), f(3 * c), f(c, c), f(c))
    table = jax.random.normal(rng, ((2 * w - 1) ** 2, heads)) * 0.02
    idx = _relative_position_index(w).reshape(-1)
    bias = table[idx].reshape(n, n, heads).transpose(2, 0, 1).astype(
        jnp.bfloat16)
    mask = jnp.asarray(_shift_attn_mask(hw, hw, w, w // 2)) if shifted \
        else None
    mlp = (jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32) + .01,
           f(c, 4 * c), f(4 * c), f(4 * c, c), f(c))
    kw = dict(window=w, num_heads=heads)

    @jax.jit
    def parity(x):
        got = swin_block_fused(x, *attn, bias, mask, *mlp, **kw)
        want = swin_block_reference(x, *attn, bias, mask, *mlp, **kw)
        return jnp.max(jnp.abs(got.astype(jnp.float32)
                               - want.astype(jnp.float32)))

    err = float(parity(x))
    s = timed_scan(lambda x: swin_block_fused(
        x, *attn, bias, mask, *mlp, **kw).astype(jnp.float32).mean(), (x,))

    def split(x):
        y = window_mhsa_fused(x, *attn, bias, mask, **kw)
        return mlp_block_fused(y, *mlp)

    s_split = timed_scan(lambda x: split(x).astype(jnp.float32).mean(), (x,))
    print(json.dumps({
        "metric": f"merged Swin block {name}"
                  f"{' shifted' if shifted else ''}",
        "max_abs_err": round(err, 5),
        "merged_ms": round(s * 1e3, 3),
        "split_ms": round(s_split * 1e3, 3),
        "speedup": round(s_split / s, 2),
    }), flush=True)


def main():
    b = 16
    if "--nano" in sys.argv:
        # CPU-interpret plumbing check of the on-chip rows (tiny shapes);
        # validates code paths so the real run doesn't burn tunnel time
        # on a python error
        run_stage("nano w7 (14^2, c=32, h=2)", 1, 14, 32, 2, w=7)
        run_stage("nano w7 shifted", 1, 14, 32, 2, w=7, shifted=True)
        run_stage("nano w4 (8^2, c=32, h=2)", 1, 8, 32, 2, w=4)
        return
    if "--odd_window" in sys.argv:
        # window-7 (224-class models: the reference TERL default,
        # TERL/6_baseline_learnT/runT.sh swin_T_224) at the padded
        # (w+1)^2 in-kernel geometry — swin_T stages 1-3 + swin_L stage 3
        run_stage("swinT224 s1 (56^2, c=96, h=3, w=7)", b, 56, 96, 3, w=7)
        run_stage("swinT224 s1 shifted", b, 56, 96, 3, w=7, shifted=True)
        run_stage("swinT224 s2 (28^2, c=192, h=6, w=7)", b, 28, 192, 6, w=7)
        run_stage("swinT224 s3 (14^2, c=384, h=12, w=7)", b, 14, 384, 12,
                  w=7)
        run_stage("swinL224 s3 (14^2, c=768, h=24, w=7)", b, 14, 768, 24,
                  w=7)
        run_stage("swinL224 s3 shifted", b, 14, 768, 24, w=7, shifted=True)
        return
    if "--merged_only" not in sys.argv:
        run_stage("stage1 (96^2, c=192, h=6)", b, 96, 192, 6)
        run_stage("stage1 (96^2, c=192, h=6)", b, 96, 192, 6, shifted=True)
        run_stage("stage2 (48^2, c=384, h=12)", b, 48, 384, 12)
        run_stage("stage2 (48^2, c=384, h=12)", b, 48, 384, 12, shifted=True)
        run_stage("stage3 (24^2, c=768, h=24)", b, 24, 768, 24)
        run_stage("stage3 (24^2, c=768, h=24)", b, 24, 768, 24, shifted=True)
        run_mlp("stage1 (96^2, c=192)", b, 96, 192)
        run_mlp("stage2 (48^2, c=384)", b, 48, 384)
        run_mlp("stage3 (24^2, c=768)", b, 24, 768)
    run_block("stage1 (96^2, c=192, h=6)", b, 96, 192, 6)
    run_block("stage1 (96^2, c=192, h=6)", b, 96, 192, 6, shifted=True)
    run_block("stage2 (48^2, c=384, h=12)", b, 48, 384, 12)
    run_block("stage3 (24^2, c=768, h=24)", b, 24, 768, 24)
    run_block("stage3 (24^2, c=768, h=24)", b, 24, 768, 24, shifted=True)


if __name__ == "__main__":
    main()
