"""SwinL-384 stage-3 roofline: where do the 38 ms (of 72 ms, b=16) go?

Measures, on the real chip with the chained-scan methodology (docs/BENCH.md):
  * each raw GEMM of a stage-3 block at its exact shape (bf16 and int8)
    with achieved TFLOP/s vs the v5e peak (~197 bf16 / ~394 int8);
  * the attention core (BMM + bias + softmax + BMM) at stage-3 shapes;
  * a full SwinBlock vs the same block with attention replaced by identity
    — splits GEMM time from attention+layout time;
  * LayerNorm at the stage-3 activation shape.

The sum of parts vs the measured block isolates fusion/layout overhead;
parts vs peak isolate shape inefficiency. Decides which lever (int8 convs,
LN+QKV epilogue fusion, head packing) actually pays before building it.

Run (TPU, single process!): python scripts/swin_roofline.py
"""

import functools
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

BF16_PEAK = 197e12
INT8_PEAK = 394e12


_BASELINE = [None]


def timed_scan(fn, args, iters=64, eps_on=0):
    """Time fn(*args) via an anti-hoisting chained scan; returns seconds
    per iteration with the fixed dispatch/tunnel overhead (measured once
    via an empty loop) subtracted."""
    eps = (jax.random.normal(jax.random.PRNGKey(9), (iters,)) * 1e-3)

    @jax.jit
    def loop(*args):
        def step(acc, i):
            a = list(args)
            a[eps_on] = a[eps_on] + eps[i].astype(a[eps_on].dtype)
            return acc + fn(*a), None

        total, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(iters))
        return total

    if _BASELINE[0] is None:
        _BASELINE[0] = 0.0
        z = jnp.zeros((8, 8), jnp.float32)
        _BASELINE[0] = max(0.0, timed_scan(
            lambda z: z.mean(), (z,), iters=iters) * iters)
        print(json.dumps({"metric": "fixed dispatch overhead",
                          "ms": round(_BASELINE[0] * 1e3, 2)}), flush=True)
    float(loop(*args))
    t0 = time.perf_counter()
    float(loop(*args))
    return max(1e-9, (time.perf_counter() - t0 - _BASELINE[0])) / iters


def report(name, secs, flops=None, peak=BF16_PEAK):
    row = {"metric": name, "ms": round(secs * 1e3, 3)}
    if flops:
        row["tflops"] = round(flops / secs / 1e12, 1)
        row["mxu_util"] = round(flops / secs / peak, 3)
    print(json.dumps(row), flush=True)
    return row


def gemm_bf16(name, m, k, n, rng):
    a = jax.random.normal(rng, (m, k), jnp.bfloat16)
    b = jax.random.normal(rng, (k, n), jnp.bfloat16)
    s = timed_scan(lambda a, b: (a @ b).astype(jnp.float32).mean(), (a, b))
    return report(f"GEMM bf16 {name} {m}x{k}x{n}", s, 2 * m * k * n)


def gemm_int8(name, m, k, n, rng):
    a = jax.random.randint(rng, (m, k), -127, 127, jnp.int8)
    b = jax.random.randint(rng, (k, n), -127, 127, jnp.int8)

    def f(a, b):
        acc = jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32).mean()

    # eps perturbation in int8: rotate instead
    s = timed_scan(lambda a, b: f(a, b), (a.astype(jnp.bfloat16),
                                          b.astype(jnp.bfloat16)))
    # NOTE ^ int8 inputs can't take float eps; time the true int8 path with
    # a roll-based variant below
    eps_free = timed_scan_int8(f, a, b)
    return report(f"GEMM int8 {name} {m}x{k}x{n}", eps_free, 2 * m * k * n,
                  peak=INT8_PEAK)


def timed_scan_int8(fn, a, b, iters=64):
    @jax.jit
    def loop(a, b):
        def step(acc, i):
            return acc + fn(jnp.roll(a, i, axis=0), b), None

        total, _ = jax.lax.scan(step, jnp.zeros(()), jnp.arange(iters))
        return total

    float(loop(a, b))
    t0 = time.perf_counter()
    float(loop(a, b))
    return (time.perf_counter() - t0) / iters


def main(batch=16):
    from computervision_codes_tpu.models.swin import SwinBlock

    rng = jax.random.PRNGKey(0)
    dim, heads, w = 768, 24, 12
    hgt = wid = 24
    tokens = batch * hgt * wid  # 9216
    n = w * w  # 144

    print(f"== raw GEMMs of one stage-3 block (b={batch}) ==", flush=True)
    rows = {}
    rows["qkv"] = gemm_bf16("qkv", tokens, dim, 3 * dim, rng)
    rows["proj"] = gemm_bf16("proj", tokens, dim, dim, rng)
    rows["mlp1"] = gemm_bf16("mlp1", tokens, dim, 4 * dim, rng)
    rows["mlp2"] = gemm_bf16("mlp2", tokens, 4 * dim, dim, rng)
    gemm_ms = sum(r["ms"] for r in rows.values())
    print(json.dumps({"metric": "sum of raw GEMMs", "ms": round(gemm_ms, 3)}),
          flush=True)

    print("== same GEMMs int8 ==", flush=True)
    gemm_int8("qkv", tokens, dim, 3 * dim, rng)
    gemm_int8("mlp1", tokens, dim, 4 * dim, rng)
    gemm_int8("mlp2", tokens, 4 * dim, dim, rng)

    print("== attention core at stage-3 shapes ==", flush=True)
    bw = batch * 4  # 4 windows
    q = jax.random.normal(rng, (bw, heads, n, dim // heads), jnp.bfloat16)
    bias = jax.random.normal(rng, (heads, n, n), jnp.bfloat16)

    def attn_core(q, bias):
        k = v = q
        a = jnp.einsum("bhnd,bhmd->bhnm", q * 0.176, k) + bias[None]
        a = jax.nn.softmax(a.astype(jnp.float32), axis=-1).astype(q.dtype)
        o = jnp.einsum("bhnm,bhmd->bhnd", a, v)
        return o.astype(jnp.float32).mean()

    s = timed_scan(attn_core, (q, bias))
    bmm_flops = 2 * 2 * bw * heads * n * n * (dim // heads)
    report(f"attention core (bw={bw}, h={heads}, n={n}, d=32)", s, bmm_flops)

    print("== full block vs no-attention block ==", flush=True)
    x = jax.random.normal(rng, (batch, hgt, wid, dim), jnp.bfloat16)
    blk = SwinBlock(dim=dim, num_heads=heads, window=w, shift=0,
                    dtype=jnp.bfloat16)
    bv = blk.init(rng, x[:1])
    s_full = timed_scan(
        lambda v, x: blk.apply(v, x).astype(jnp.float32).mean(), (bv, x),
        eps_on=1)
    report("SwinBlock stage3 full (unshifted)", s_full)
    blk_s = SwinBlock(dim=dim, num_heads=heads, window=w, shift=6,
                      dtype=jnp.bfloat16)
    bvs = blk_s.init(rng, x[:1])
    s_shift = timed_scan(
        lambda v, x: blk_s.apply(v, x).astype(jnp.float32).mean(), (bvs, x),
        eps_on=1)
    report("SwinBlock stage3 full (shifted)", s_shift)

    print("== LayerNorm at stage-3 activation shape ==", flush=True)
    from flax import linen as fnn

    ln = fnn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16)
    lv = ln.init(rng, x)
    s = timed_scan(lambda v, x: ln.apply(v, x).astype(jnp.float32).mean(),
                   (lv, x), eps_on=1)
    report("LayerNorm (16,24,24,768)", s)

    print(json.dumps({
        "metric": "stage3 accounting (x18 blocks)",
        "gemm_only_ms": round(gemm_ms * 18, 1),
        "block_full_ms": round(s_full * 1e3 * 18, 1),
        "note": "block - gemms = attention + LN + layout per block",
    }), flush=True)

    print("== stage-1 anatomy (22.3 ms measured for patch-embed + "
          "2 blocks) ==", flush=True)
    from flax import linen as fnn2

    imgs = jax.random.normal(rng, (batch, 384, 384, 3), jnp.bfloat16)
    conv = fnn2.Conv(192, (4, 4), strides=4, dtype=jnp.bfloat16)
    cv = conv.init(rng, imgs[:1])
    s = timed_scan(lambda v, x: conv.apply(v, x).astype(jnp.float32).mean(),
                   (cv, imgs), eps_on=1)
    report("patch-embed Conv 4x4/s4 3->192 (b=16, 384^2)", s,
           2 * batch * 96 * 96 * 48 * 192)

    def s2d_embed(v, x):
        b = x.shape[0]
        p = x.reshape(b, 96, 4, 96, 4, 3).transpose(0, 1, 3, 2, 4, 5)
        p = p.reshape(b, 96, 96, 48)
        w = v["params"]["kernel"].reshape(48, 192)
        return (p @ w + v["params"]["bias"]).astype(jnp.float32).mean()

    s = timed_scan(s2d_embed, (cv, imgs), eps_on=1)
    report("patch-embed as reshape+GEMM (exact rewrite)", s,
           2 * batch * 96 * 96 * 48 * 192)

    x1 = jax.random.normal(rng, (batch, 96, 96, 192), jnp.bfloat16)
    blk1 = SwinBlock(dim=192, num_heads=6, window=w, shift=0,
                     dtype=jnp.bfloat16)
    b1v = blk1.init(rng, x1[:1])
    s = timed_scan(
        lambda v, x: blk1.apply(v, x).astype(jnp.float32).mean(), (b1v, x1),
        eps_on=1)
    report("SwinBlock stage1 full (unshifted)", s)
    blk1s = SwinBlock(dim=192, num_heads=6, window=w, shift=6,
                      dtype=jnp.bfloat16)
    b1sv = blk1s.init(rng, x1[:1])
    s = timed_scan(
        lambda v, x: blk1s.apply(v, x).astype(jnp.float32).mean(),
        (b1sv, x1), eps_on=1)
    report("SwinBlock stage1 full (shifted)", s)

    bw1 = batch * 64
    q1 = jax.random.normal(rng, (bw1, 6, n, 32), jnp.bfloat16)
    bias1 = jax.random.normal(rng, (6, n, n), jnp.bfloat16)
    s = timed_scan(attn_core, (q1, bias1))
    report(f"attention core stage1 (bw={bw1}, h=6, n={n}, d=32)", s,
           2 * 2 * bw1 * 6 * n * n * 32)

    ln1 = fnn2.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16)
    l1v = ln1.init(rng, x1)
    s = timed_scan(lambda v, x: ln1.apply(v, x).astype(jnp.float32).mean(),
                   (l1v, x1), eps_on=1)
    report("LayerNorm (16,96,96,192)", s)

    s = timed_scan(lambda x: jnp.roll(x, (-6, -6), (1, 2)).astype(
        jnp.float32).mean(), (x1,))
    report("roll shift (16,96,96,192)", s)

    from computervision_codes_tpu.models.swin import (window_partition,
                                                      window_reverse)

    s = timed_scan(lambda x: window_partition(x, w).astype(
        jnp.float32).mean(), (x1,))
    report("window_partition (16,96,96,192)", s)

    g1 = jax.random.normal(rng, (batch * 96 * 96, 192), jnp.bfloat16)
    k1 = jax.random.normal(rng, (192, 576), jnp.bfloat16)
    s = timed_scan(lambda a, b: (a @ b).astype(jnp.float32).mean(),
                   (g1, k1))
    report("GEMM bf16 stage1 qkv 147456x192x576", s,
           2 * batch * 96 * 96 * 192 * 576)


if __name__ == "__main__":
    main()
