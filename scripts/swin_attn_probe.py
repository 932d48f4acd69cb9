"""Probe: which part of WindowAttention costs 4-5 ms/block beyond its parts?

Suspects at stage-1 shapes (bw=1024, h=6, n=144, d=32, b=16):
  * the relative-position-bias table gather (table[idx]: 20736-row gather
    per forward);
  * the qkv 5D transpose (bw,n,3,h,d)->(3,bw,h,n,d) (255 MB moved);
  * the f32 softmax materialization (509 MB);
  * einsum layout choices.

Run (TPU): python scripts/swin_attn_probe.py
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from scripts.swin_roofline import timed_scan, report


def main():
    from computervision_codes_tpu.models.swin import (
        WindowAttention,
        _relative_position_index,
    )

    rng = jax.random.PRNGKey(0)
    bw, h, n, d, c = 1024, 6, 144, 32, 192
    x = jax.random.normal(rng, (bw, n, c), jnp.bfloat16)

    wa = WindowAttention(dim=c, window=12, num_heads=h, dtype=jnp.bfloat16)
    wv = wa.init(rng, x[:1])
    s = timed_scan(lambda v, x: wa.apply(v, x).astype(jnp.float32).mean(),
                   (wv, x), eps_on=1)
    report("WindowAttention module stage1 (bw=1024)", s)

    # bias gather alone
    table = wv["params"]["relative_position_bias_table"]
    idx = jnp.asarray(_relative_position_index(12).reshape(-1))

    def gather_bias(t):
        return t[idx].reshape(n, n, h).transpose(2, 0, 1).astype(
            jnp.float32).mean()

    s = timed_scan(gather_bias, (table,))
    report("rel-pos bias gather (20736 rows, h=6)", s)

    # precompute bias once; same module math with bias passed in
    bias = table[idx].reshape(n, n, h).transpose(2, 0, 1).astype(jnp.bfloat16)
    qkv_w = wv["params"]["qkv"]["kernel"].astype(jnp.bfloat16)
    qkv_b = wv["params"]["qkv"]["bias"].astype(jnp.bfloat16)
    proj_w = wv["params"]["proj"]["kernel"].astype(jnp.bfloat16)
    proj_b = wv["params"]["proj"]["bias"].astype(jnp.bfloat16)

    def attn_manual(x, bias, transpose_5d, f32_softmax):
        qkv = x @ qkv_w + qkv_b  # (bw, n, 3c)
        if transpose_5d:
            qkv = qkv.reshape(bw, n, 3, h, d).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]  # (bw, h, n, d)
            a = jnp.einsum("bhnd,bhmd->bhnm", q * (d ** -0.5), k)
        else:
            q = qkv[..., :c].reshape(bw, n, h, d)
            k = qkv[..., c:2 * c].reshape(bw, n, h, d)
            v = qkv[..., 2 * c:].reshape(bw, n, h, d)
            a = jnp.einsum("bnhd,bmhd->bhnm", q * (d ** -0.5), k)
        a = a + bias[None].astype(a.dtype)
        if f32_softmax:
            a = jax.nn.softmax(a.astype(jnp.float32), -1).astype(x.dtype)
        else:
            a = jax.nn.softmax(a, -1)
        if transpose_5d:
            o = jnp.einsum("bhnm,bhmd->bhnd", a, v)
            o = o.transpose(0, 2, 1, 3).reshape(bw, n, c)
        else:
            o = jnp.einsum("bhnm,bmhd->bnhd", a, v).reshape(bw, n, c)
        return (o @ proj_w + proj_b).astype(jnp.float32).mean()

    for t5, f32s, tag in ((True, True, "5d-transpose + f32 softmax (module path)"),
                          (False, True, "slice-layout + f32 softmax"),
                          (True, False, "5d-transpose + bf16 softmax"),
                          (False, False, "slice-layout + bf16 softmax")):
        s = timed_scan(lambda x, b, t5=t5, f32s=f32s: attn_manual(
            x, b, t5, f32s), (x, bias))
        report(f"manual attn: {tag}", s)

    # fused Pallas kernel at this shape for comparison (one-window + multi)
    from computervision_codes_tpu.ops.window_attention import (
        window_attention_pallas,
        window_attention_pallas_multi,
    )

    q = jax.random.normal(rng, (bw, h, n, d), jnp.bfloat16)
    s = timed_scan(lambda q: window_attention_pallas(
        q, q, q, bias, None, 1).astype(jnp.float32).mean(), (q,))
    report("pallas one-window kernel (core only)", s)
    for g in (2, 4, 8):
        try:
            s = timed_scan(lambda q, g=g: window_attention_pallas_multi(
                q, q, q, bias, None, 1, g).astype(jnp.float32).mean(), (q,))
            report(f"pallas multi-window kernel g={g} (core only)", s)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"metric": f"pallas multi g={g}",
                              "error": str(e)[:120]}), flush=True)


if __name__ == "__main__":
    main()
