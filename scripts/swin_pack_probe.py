"""Probe: window-MHSA inner-loop formulations on-chip.

The fused half-block kernel (ops/window_mhsa.py) spends its inner loop on
per-(window, head) matmuls of shape (144,32)@(32,144) and (144,144)@
(144,32) — K/N of 32 fills 1/4 of the MXU, so MXU time is ~4x ideal for
EVERY grouping (packing g heads into one block-diagonal GEMM trades g-fold
FLOP redundancy for g/4-fold utilization: a wash for g<=4). What packing
CAN change is everything around the MXU: 6-24x fewer matmul instructions,
no sub-128-lane head slicing, head-batched softmax, no output concat.
This probe measures three formulations at SwinL stage-1/3 shapes (b=16):

  loop    — the shipped per-head loop (ops/window_mhsa._kernel)
  pack<g> — block-diagonal head groups: q_G (n, g*hd) @ masked-tile
            K_G (g*n, g*hd) -> all g score blocks in one GEMM; row-max
            softmax (a row-wide max upper-bounds every block max, and
            softmax is shift-invariant per block); block denominators via
            ones-matmul; p_G @ masked-tile V_G emits the group's heads
            pre-concatenated.
  batched — per-window batched dot_general over a (h, n, hd) layout
            (costs two in-kernel head transposes).

Run (TPU, single process!): python scripts/swin_pack_probe.py
"""

import functools
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scripts.swin_roofline import timed_scan
from computervision_codes_tpu.ops.window_mhsa import (
    window_mhsa_fused,
    window_mhsa_reference,
)
from computervision_codes_tpu.models.swin import _relative_position_index


def _ln_qkv(x_ref, gamma_ref, beta_ref, wqkv_ref, bqkv_ref, *, w, cols, c):
    rows = x_ref[0]
    wp = rows.shape[1]
    xf = rows.reshape(w * wp, c).astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    normed = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
    normed = (normed * gamma_ref[...].astype(jnp.float32)
              + beta_ref[...].astype(jnp.float32)).astype(x_ref.dtype)
    qkv = jax.lax.dot_general(normed, wqkv_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(x_ref.dtype)
    return rows, qkv.reshape(w, wp, 3 * c)


def _emit(o_ref, rows, j, w, c, o, wproj_ref, bproj_ref):
    o = jax.lax.dot_general(o, wproj_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o = (o + bproj_ref[...].astype(jnp.float32)).astype(o_ref.dtype)
    res = rows[:, j * w:(j + 1) * w, :].reshape(w * w, c)
    o_ref[0, :, j * w:(j + 1) * w, :] = (o + res).reshape(w, w, c)


def _pack_kernel(x_ref, gamma_ref, beta_ref, wqkv_ref, bqkv_ref, wproj_ref,
                 bproj_ref, biasp_ref, kmask_ref, sum_ref, exp_ref, o_ref, *,
                 window, num_heads, cols, group):
    w, c, g = window, x_ref.shape[-1], group
    n = w * w
    hd = c // num_heads
    ng = num_heads // g
    scale = hd ** -0.5
    rows, qkv = _ln_qkv(x_ref, gamma_ref, beta_ref, wqkv_ref, bqkv_ref,
                        w=w, cols=cols, c=c)
    kmask = kmask_ref[...]
    for j in range(cols):
        win = qkv[:, j * w:(j + 1) * w, :].reshape(n, 3 * c)
        outs = []
        for G in range(ng):
            sl = slice(G * g * hd, (G + 1) * g * hd)
            qg = win[:, sl]
            kg = win[:, c + G * g * hd:c + (G + 1) * g * hd]
            vg = win[:, 2 * c + G * g * hd:2 * c + (G + 1) * g * hd]
            kbig = jnp.tile(kg, (g, 1)) * kmask
            s = jax.lax.dot_general(qg, kbig, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            s = s * scale + biasp_ref[G].astype(jnp.float32)
            m = jnp.max(s, axis=-1, keepdims=True)
            e = jnp.exp(s - m)
            denom = jax.lax.dot_general(e, sum_ref[...],
                                        (((1,), (0,)), ((), ())))
            dexp = jax.lax.dot_general(1.0 / denom, exp_ref[...],
                                       (((1,), (0,)), ((), ())))
            p = (e * dexp).astype(x_ref.dtype)
            vbig = jnp.tile(vg, (g, 1)) * kmask
            outs.append(jax.lax.dot_general(
                p, vbig, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(x_ref.dtype))
        o = outs[0] if ng == 1 else jnp.concatenate(outs, axis=-1)
        _emit(o_ref, rows, j, w, c, o, wproj_ref, bproj_ref)


def _batched_kernel(x_ref, gamma_ref, beta_ref, wqkv_ref, bqkv_ref,
                    wproj_ref, bproj_ref, bias_ref, o_ref, *, window,
                    num_heads, cols):
    w, c = window, x_ref.shape[-1]
    n = w * w
    hd = c // num_heads
    scale = hd ** -0.5
    rows, qkv = _ln_qkv(x_ref, gamma_ref, beta_ref, wqkv_ref, bqkv_ref,
                        w=w, cols=cols, c=c)
    for j in range(cols):
        win = qkv[:, j * w:(j + 1) * w, :].reshape(n, 3 * c)
        q = win[:, :c].reshape(n, num_heads, hd).transpose(1, 0, 2)
        k = win[:, c:2 * c].reshape(n, num_heads, hd).transpose(1, 0, 2)
        v = win[:, 2 * c:].reshape(n, num_heads, hd).transpose(1, 0, 2)
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s * scale + bias_ref[...].astype(jnp.float32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(x_ref.dtype)
        o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o = o.astype(x_ref.dtype).transpose(1, 0, 2).reshape(n, c)
        _emit(o_ref, rows, j, w, c, o, wproj_ref, bproj_ref)


def _common_specs(wp, c, num_heads, w):
    return [
        pl.BlockSpec((1, w, wp, c), lambda i, r: (i, r, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((c,), lambda i, r: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((c,), lambda i, r: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, 3 * c), lambda i, r: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * c,), lambda i, r: (0,), memory_space=pltpu.VMEM),
        pl.BlockSpec((c, c), lambda i, r: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((c,), lambda i, r: (0,), memory_space=pltpu.VMEM),
    ]


def mhsa_pack(x, gamma, beta, wqkv, bqkv, wproj, bproj, bias, *, window,
              num_heads, group):
    b, hp, wp, c = x.shape
    w, g = window, group
    n = w * w
    hd = c // num_heads
    ng = num_heads // g
    # packed bias: (ng, n, g*n) — head block h' of group G at cols h'*n:
    biasp = bias.reshape(ng, g, n, n).transpose(0, 2, 1, 3).reshape(
        ng, n, g * n).astype(jnp.bfloat16)
    km = np.zeros((g * n, g * hd), np.float32)
    for h in range(g):
        km[h * n:(h + 1) * n, h * hd:(h + 1) * hd] = 1.0
    kmask = jnp.asarray(km, jnp.bfloat16)
    sm = np.zeros((g * n, g), np.float32)
    em = np.zeros((g, g * n), np.float32)
    for h in range(g):
        sm[h * n:(h + 1) * n, h] = 1.0
        em[h, h * n:(h + 1) * n] = 1.0
    kernel = functools.partial(_pack_kernel, window=w, num_heads=num_heads,
                               cols=wp // w, group=g)
    specs = _common_specs(wp, c, num_heads, w) + [
        pl.BlockSpec((ng, n, g * n), lambda i, r: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((g * n, g * hd), lambda i, r: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((g * n, g), lambda i, r: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((g, g * n), lambda i, r: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, hp // w), in_specs=specs,
        out_specs=pl.BlockSpec((1, w, wp, c), lambda i, r: (i, r, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(x, gamma, beta, wqkv, bqkv, wproj, bproj, biasp, kmask,
      jnp.asarray(sm), jnp.asarray(em))


def mhsa_batched(x, gamma, beta, wqkv, bqkv, wproj, bproj, bias, *, window,
                 num_heads):
    b, hp, wp, c = x.shape
    w = window
    n = w * w
    kernel = functools.partial(_batched_kernel, window=w,
                               num_heads=num_heads, cols=wp // w)
    specs = _common_specs(wp, c, num_heads, w) + [
        pl.BlockSpec((num_heads, n, n), lambda i, r: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(b, hp // w), in_specs=specs,
        out_specs=pl.BlockSpec((1, w, wp, c), lambda i, r: (i, r, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(x, gamma, beta, wqkv, bqkv, wproj, bproj, bias.astype(x.dtype))


def run_stage(name, b, hw, c, heads, groups, w=12):
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
    kw = dict(window=w, num_heads=heads)

    def check_and_time(tag, fn):
        @jax.jit
        def parity(x):
            got = fn(x)
            want = window_mhsa_reference(x, gamma, beta, wqkv, bqkv, wproj,
                                         bproj, bias, None, **kw)
            return jnp.max(jnp.abs(got.astype(jnp.float32)
                                   - want.astype(jnp.float32)))
        try:
            err = float(parity(x))
            s = timed_scan(lambda x: fn(x).astype(jnp.float32).mean(), (x,),
                           iters=32)
        except Exception as e:  # Mosaic lowering gaps are data, not crashes
            print(json.dumps({"metric": f"{name} {tag}",
                              "error": str(e).split("\n")[0][:120]}),
                  flush=True)
            return None
        print(json.dumps({"metric": f"{name} {tag}", "ms": round(s * 1e3, 3),
                          "max_abs_err": round(err, 5)}), flush=True)
        return s

    check_and_time("loop", lambda x: window_mhsa_fused(
        x, gamma, beta, wqkv, bqkv, wproj, bproj, bias, None, **kw))
    for g in groups:
        check_and_time(f"pack{g}", lambda x, g=g: mhsa_pack(
            x, gamma, beta, wqkv, bqkv, wproj, bproj, bias, group=g, **kw))
    check_and_time("batched", lambda x: mhsa_batched(
        x, gamma, beta, wqkv, bqkv, wproj, bproj, bias, **kw))


def main():
    b = 16
    run_stage("MHSA stage1 (96^2, c=192, h=6)", b, 96, 192, 6, (2, 3, 6))
    run_stage("MHSA stage3 (24^2, c=768, h=24)", b, 24, 768, 24, (4, 8))


if __name__ == "__main__":
    main()
