"""Attention ops: XLA reference + Pallas blockwise TPU kernel.

The reference materializes full T×T attention for whole-video sequences
(MSTCT/Temporal_Encoder.py:76-88 evaluated at full video length,
Temporal_mstct/run.py:248) — an O(T²) memory wall. Here the forward pass is
a Pallas kernel that blocks over queries and streams keys/values through
VMEM, so peak memory is O(block_q · T) instead of O(T²); the backward pass
recomputes the XLA reference (training uses short windows — 256 frames in
the reference — where O(T²) is cheap; full-video inference is forward-only).

All functions take (B, H, T, D) query/key/value.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def attention_reference(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Plain XLA attention (the parity baseline for the Pallas kernel)."""
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, t_actual: int, scale: float):
    q = q_ref[0].astype(jnp.float32) * scale  # (bq, D)
    k = k_ref[0].astype(jnp.float32)  # (Tp, D)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (bq, Tp)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < t_actual, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    o = jax.lax.dot_general(p, v_ref[0].astype(jnp.float32),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q",))
def attention_pallas(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     block_q: int = 256) -> jnp.ndarray:
    """Query-blocked attention; keys/values stream once per query block.

    Shapes are static under jit, so sequence length and padding are resolved
    at trace time. Head dim and T are zero-padded to lane multiples; padded
    key columns are masked with -inf inside the kernel.
    """
    b, h, t, d = q.shape
    tk = k.shape[2]
    dtype = q.dtype
    tp = _round_up(tk, _LANE)
    dp = _round_up(d, _LANE)
    bq = min(block_q, _round_up(t, _LANE))
    tq = _round_up(t, bq)

    def prep(x, tpad):
        x = x.reshape(b * h, x.shape[2], d)
        return jnp.pad(x, ((0, 0), (0, tpad - x.shape[1]), (0, dp - d)))

    qf, kf, vf = prep(q, tq), prep(k, tp), prep(v, tp)
    grid = (b * h, tq // bq)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, t_actual=tk, scale=d ** -0.5),
        out_shape=jax.ShapeDtypeStruct((b * h, tq, dp), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dp), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=not _on_tpu(),  # CPU tests run the kernel interpreted
    )(qf, kf, vf)
    return out[:, :t, :d].reshape(b, h, t, d)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no devices
        return False


@jax.custom_vjp
def _mha(q, k, v):
    if _on_tpu():
        return attention_pallas(q, k, v)
    return attention_reference(q, k, v)


def _mha_fwd(q, k, v):
    return _mha(q, k, v), (q, k, v)


def _mha_bwd(res, g):
    # Recompute through the XLA reference for gradients (training sequences
    # are short windows; see module docstring).
    q, k, v = res
    _, vjp = jax.vjp(attention_reference, q, k, v)
    return vjp(g)


_mha.defvjp(_mha_fwd, _mha_bwd)


def multi_head_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                         backend: str = "auto") -> jnp.ndarray:
    """Dispatching attention: 'auto' uses the Pallas kernel on TPU."""
    if backend == "xla":
        return attention_reference(q, k, v)
    if backend == "pallas":
        return attention_pallas(q, k, v)
    return _mha(q, k, v)
