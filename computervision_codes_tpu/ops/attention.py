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


def _flash_kernel(q_ref, k_hbm, v_hbm, o_ref, k_scr, v_scr, sem,
                  *, t_actual: int, scale: float, block_k: int):
    """Streaming flash attention: K/V blocks are DMA'd from HBM one at a
    time with running-softmax accumulation, so VMEM holds only
    O(block_q·block_k) score tiles — single-chip T is bounded by HBM, not
    VMEM (~100k+ frames)."""
    i = pl.program_id(0)
    bq = q_ref.shape[1]
    dp = q_ref.shape[2]
    q = q_ref[0].astype(jnp.float32) * scale  # (bq, D)
    tk_padded = k_hbm.shape[1]
    nk = tk_padded // block_k

    def body(step, carry):
        m, l, acc = carry
        dma_k = pltpu.make_async_copy(
            k_hbm.at[i, pl.ds(step * block_k, block_k), :], k_scr, sem)
        dma_k.start()
        dma_k.wait()
        dma_v = pltpu.make_async_copy(
            v_hbm.at[i, pl.ds(step * block_k, block_k), :], v_scr, sem)
        dma_v.start()
        dma_v.wait()
        s = jax.lax.dot_general(q, k_scr[...].astype(jnp.float32),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        col = step * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < t_actual, s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        c = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[:, None])
        acc = acc * c[:, None] + jax.lax.dot_general(
            p, v_scr[...].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        l = l * c + jnp.sum(p, axis=-1)
        return m_new, l, acc

    m0 = jnp.full((bq,), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    acc0 = jnp.zeros((bq, dp), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nk, body, (m0, l0, acc0))
    o_ref[0] = (acc / l[:, None]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention_pallas(q, k, v, block_q: int = 256, block_k: int = 512):
    """Streaming-KV variant of attention_pallas for very long sequences."""
    b, h, t, d = q.shape
    tk = k.shape[2]
    dtype = q.dtype
    dp = _round_up(d, _LANE)
    bq = min(block_q, _round_up(t, _LANE))
    tq = _round_up(t, bq)
    tp = _round_up(tk, block_k)

    def prep(x, tpad):
        x = x.reshape(b * h, x.shape[2], d)
        return jnp.pad(x, ((0, 0), (0, tpad - x.shape[1]), (0, dp - d)))

    qf, kf, vf = prep(q, tq), prep(k, tp), prep(v, tp)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, t_actual=tk, scale=d ** -0.5,
                          block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((b * h, tq, dp), dtype),
        grid=(b * h, tq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # K stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # V stays in HBM
        ],
        out_specs=pl.BlockSpec((1, bq, dp), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_k, dp), dtype),
            pltpu.VMEM((block_k, dp), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=jax.default_backend() != "tpu",
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
