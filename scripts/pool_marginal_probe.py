"""Marginal cost of the stem maxpool IN CONTEXT (round 5).

stem_probe.py's standalone maxpool row (7.94 ms at b=128) is ~11x off
the ~0.7 ms bandwidth bound for its 0.6 GB of traffic, which would make
the pool — not the conv — the entire stem story. But a standalone
reduce_window over a fresh input measures cold HBM reads; in the e2e
graph XLA fuses bias+relu into the conv and may pipeline the pool
differently. This measures the pool's MARGINAL cost in the real
composition, plus XLA alternatives:

  arms (b=128, 256x448x3 -> 64x112x64):
    A conv+bias+relu                  (no pool)
    B conv+bias+relu+maxpool          (the e2e stem composition)
    C conv+bias+relu+pool via reshaped max (stride-2 3-tap decomposed)
    D standalone maxpool on a resident input (stem_probe row, control)

B-A is the number that decides whether a pool kernel can move the
student headline. Reference stem: MT4MTLKD/Spatial_cnn/network.py:95-118.

Run (TPU, single process!): python scripts/pool_marginal_probe.py
"""

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from scripts.swin_roofline import timed_scan, report

B = 128


def conv_relu(x, w, bias):
    y = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return jax.nn.relu(y + bias).astype(x.dtype)


def pool(y):
    return jax.lax.reduce_window(
        y, -jnp.inf if y.dtype == jnp.float32 else jnp.finfo(y.dtype).min,
        jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))


def pool_decomposed(y):
    """3x3/s2/p1 max as pad + two reshaped pairwise maxes per axis —
    all contiguous ops, no reduce_window."""
    b, h, w, c = y.shape
    p = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)),
                constant_values=0)  # post-relu: zero pad exact
    # rows: out[i] = max(p[2i], p[2i+1], p[2i+2]) for i < h//2
    body = p[:, :h].reshape(b, h // 2, 2, w + 2, c)
    pair = jnp.maximum(body[:, :, 0], body[:, :, 1])
    third = p[:, 1:h + 1].reshape(b, h // 2, 2, w + 2, c)[:, :, 1]
    rows = jnp.maximum(pair, third)  # (b, h//2, w+2, c)
    cbody = rows[:, :, :w].reshape(b, h // 2, w // 2, 2, c)
    cpair = jnp.maximum(cbody[:, :, :, 0], cbody[:, :, :, 1])
    cthird = rows[:, :, 1:w + 1].reshape(b, h // 2, w // 2, 2, c)[:, :, :, 1]
    return jnp.maximum(cpair, cthird)


def main():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, 256, 448, 3), jnp.bfloat16)
    w = (jax.random.normal(rng, (7, 7, 3, 64)) * 0.1).astype(jnp.bfloat16)
    bias = (jax.random.normal(rng, (64,)) * 0.1).astype(jnp.float32)

    s = timed_scan(lambda x: conv_relu(x, w, bias).astype(
        jnp.float32).mean(), (x,))
    report(f"A conv+bias+relu no pool (b={B})", s)

    s = timed_scan(lambda x: pool(conv_relu(x, w, bias)).astype(
        jnp.float32).mean(), (x,))
    report(f"B conv+bias+relu+maxpool (b={B})", s)

    s = timed_scan(lambda x: pool_decomposed(conv_relu(x, w, bias)).astype(
        jnp.float32).mean(), (x,))
    report(f"C conv+relu+DECOMPOSED pool (b={B})", s)

    y = jax.random.normal(rng, (B, 128, 224, 64), jnp.bfloat16)
    s = timed_scan(lambda y: pool(y).astype(jnp.float32).mean(), (y,))
    report(f"D standalone maxpool control (b={B})", s)

    s = timed_scan(lambda y: pool_decomposed(y).astype(jnp.float32).mean(),
                   (y,))
    report(f"E standalone DECOMPOSED pool (b={B})", s)

    # parity: decomposed == reduce_window
    got = pool_decomposed(jax.nn.relu(y))
    want = pool(jax.nn.relu(y))
    print(json.dumps({"parity_max_abs_diff": float(
        jnp.max(jnp.abs(got.astype(jnp.float32) -
                        want.astype(jnp.float32))))}))


if __name__ == "__main__":
    main()
