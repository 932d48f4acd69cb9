"""Attention ops: XLA reference + Pallas blockwise TPU kernel.

The reference materializes full T×T attention for whole-video sequences
(MSTCT/Temporal_Encoder.py:76-88 evaluated at full video length,
Temporal_mstct/run.py:248) — an O(T²) memory wall. Here the forward pass is
a Pallas kernel that blocks over queries and streams keys/values through
VMEM, so peak memory is O(block_q · T) instead of O(T²). Two training
paths:

  * ``multi_head_attention`` (short windows, e.g. the reference's 256-frame
    MS-TCT windows): Pallas forward, O(T²) XLA recompute backward — cheap
    at window scale;
  * ``flash_attention``: fully streaming fwd AND bwd (FlashAttention-2
    style: forward saves the row logsumexp; backward runs one kernel over
    query blocks for dQ and one over key blocks for dK/dV, each DMA-ing the
    opposite operand from HBM block-by-block) — full-video TRAINING at
    100k+ frames is bounded by HBM, not VMEM and not O(T²) scratch.

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


def _flash_fwd_kernel(q_ref, k_hbm, v_hbm, o_ref, lse_ref, k_scr, v_scr, sem,
                      *, t_actual: int, scale: float, block_k: int):
    """Forward pass that also emits the row logsumexp (for the fused
    backward). Same streaming structure as _flash_kernel."""
    i = pl.program_id(0)
    bq = q_ref.shape[1]
    dp = q_ref.shape[2]
    q = q_ref[0].astype(jnp.float32) * scale
    nk = k_hbm.shape[1] // block_k

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
    lse_ref[0] = m + jnp.log(l)


def _flash_dq_kernel(q_ref, do_ref, lse_ref, dvec_ref, k_hbm, v_hbm, dq_ref,
                     k_scr, v_scr, sem, *, t_actual: int, scale: float,
                     block_k: int):
    """dQ_i = scale * sum_j dS_ij K_j with dS = P * (dO V^T - D); K/V
    blocks stream from HBM exactly like the forward."""
    i = pl.program_id(0)
    bq, dp = q_ref.shape[1], q_ref.shape[2]
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]  # (bq,)
    dvec = dvec_ref[0]  # (bq,) rowsum(dO * O)
    nk = k_hbm.shape[1] // block_k

    def body(step, dq):
        dma_k = pltpu.make_async_copy(
            k_hbm.at[i, pl.ds(step * block_k, block_k), :], k_scr, sem)
        dma_k.start()
        dma_k.wait()
        dma_v = pltpu.make_async_copy(
            v_hbm.at[i, pl.ds(step * block_k, block_k), :], v_scr, sem)
        dma_v.start()
        dma_v.wait()
        kb = k_scr[...].astype(jnp.float32)
        vb = v_scr[...].astype(jnp.float32)
        s = jax.lax.dot_general(q * scale, kb, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        col = step * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < t_actual, s, -jnp.inf)
        p = jnp.exp(s - lse[:, None])  # exp(-inf)=0 handles masked cols
        dp_ = jax.lax.dot_general(do, vb, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        ds = p * (dp_ - dvec[:, None]) * scale
        return dq + jax.lax.dot_general(ds, kb, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, nk, body, jnp.zeros((bq, dp), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _flash_dkv_kernel(k_ref, v_ref, q_hbm, do_hbm, lse_hbm, dvec_hbm,
                      dk_ref, dv_ref, q_scr, do_scr, lse_scr, dvec_scr, sem,
                      *, tq_actual: int, scale: float, block_q: int):
    """dV_j = P^T dO, dK_j = scale * dS^T Q, streaming Q/dO/lse/D blocks
    from HBM while this k-block's dK/dV accumulate in VMEM."""
    i = pl.program_id(0)
    bk, dp = k_ref.shape[1], k_ref.shape[2]
    kb = k_ref[0].astype(jnp.float32)
    vb = v_ref[0].astype(jnp.float32)
    nq = q_hbm.shape[1] // block_q

    def body(step, carry):
        dk, dv = carry
        dma_q = pltpu.make_async_copy(
            q_hbm.at[i, pl.ds(step * block_q, block_q), :], q_scr, sem)
        dma_q.start()
        dma_q.wait()
        dma_do = pltpu.make_async_copy(
            do_hbm.at[i, pl.ds(step * block_q, block_q), :], do_scr, sem)
        dma_do.start()
        dma_do.wait()
        dma_l = pltpu.make_async_copy(
            lse_hbm.at[pl.ds(i, 1), pl.ds(step * block_q, block_q)],
            lse_scr, sem)
        dma_l.start()
        dma_l.wait()
        dma_d = pltpu.make_async_copy(
            dvec_hbm.at[pl.ds(i, 1), pl.ds(step * block_q, block_q)],
            dvec_scr, sem)
        dma_d.start()
        dma_d.wait()
        qb = q_scr[...].astype(jnp.float32)
        dob = do_scr[...].astype(jnp.float32)
        lse = lse_scr[0]
        dvec = dvec_scr[0]
        # (bk, bq) transposed score tile: rows = keys, cols = queries
        s_t = jax.lax.dot_general(kb, qb * scale, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        qcol = (step * block_q
                + jax.lax.broadcasted_iota(jnp.int32, s_t.shape, 1))
        p_t = jnp.where(qcol < tq_actual, jnp.exp(s_t - lse[None, :]), 0.0)
        dv = dv + jax.lax.dot_general(p_t, dob, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp_t = jax.lax.dot_general(vb, dob, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        ds_t = p_t * (dp_t - dvec[None, :]) * scale
        dk = dk + jax.lax.dot_general(ds_t, qb, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        return dk, dv

    zero = jnp.zeros((bk, dp), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, nq, body, (zero, zero))
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_prep(q, k, v, block_q, block_k):
    b, h, t, d = q.shape
    tk = k.shape[2]
    dp = _round_up(d, _LANE)
    bq = min(block_q, _round_up(t, _LANE))
    tq = _round_up(t, bq)
    tp = _round_up(tk, block_k)

    def prep(x, tpad):
        x = x.reshape(b * h, x.shape[2], x.shape[3])
        return jnp.pad(x, ((0, 0), (0, tpad - x.shape[1]), (0, dp - d)))

    return prep(q, tq), prep(k, tp), prep(v, tp), (b, h, t, tk, d, dp, bq,
                                                   tq, tp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q, k, v, block_q: int = 256, block_k: int = 512):
    """Differentiable streaming flash attention: O(block) VMEM in BOTH
    passes, so full-video training (100k+ frames single-chip) is bounded
    by HBM, not by the O(T^2) XLA recompute the round-1 backward used."""
    out, _ = _flash_fwd(q, k, v, block_q, block_k)
    return out


def _flash_fwd(q, k, v, block_q, block_k):
    qf, kf, vf, (b, h, t, tk, d, dp, bq, tq, tp) = _flash_prep(
        q, k, v, block_q, block_k)
    dtype = q.dtype
    out, lse = pl.pallas_call(
        functools.partial(_flash_fwd_kernel, t_actual=tk, scale=d ** -0.5,
                          block_k=block_k),
        out_shape=(jax.ShapeDtypeStruct((b * h, tq, dp), dtype),
                   jax.ShapeDtypeStruct((b * h, tq), jnp.float32)),
        grid=(b * h, tq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(pl.BlockSpec((1, bq, dp), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, bq), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((block_k, dp), dtype),
            pltpu.VMEM((block_k, dp), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=jax.default_backend() != "tpu",
    )(qf, kf, vf)
    res = (q, k, v, out[:, :t, :d].reshape(q.shape), lse)
    return res[3], res


def _flash_bwd(block_q, block_k, res, g):
    q, k, v, out, lse = res
    b, h, t, d = q.shape
    tk = k.shape[2]
    dtype = q.dtype
    qf, kf, vf, (_, _, _, _, _, dp, bq, tq, tp) = _flash_prep(
        q, k, v, block_q, block_k)
    gf = jnp.pad(g.reshape(b * h, t, d), ((0, 0), (0, tq - t), (0, dp - d)))
    # D = rowsum(dO * O): one cheap fused elementwise+reduce in XLA
    dvec = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    dvec = jnp.pad(dvec.reshape(b * h, t), ((0, 0), (0, tq - t)))

    dq = pl.pallas_call(
        functools.partial(_flash_dq_kernel, t_actual=tk, scale=d ** -0.5,
                          block_k=block_k),
        out_shape=jax.ShapeDtypeStruct((b * h, tq, dp), dtype),
        grid=(b * h, tq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq, dp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bq), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, bq, dp), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_k, dp), dtype),
            pltpu.VMEM((block_k, dp), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=jax.default_backend() != "tpu",
    )(qf, gf, lse, dvec, kf, vf)

    bk = min(block_k, tp)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_dkv_kernel, tq_actual=t, scale=d ** -0.5,
                          block_q=bq),
        out_shape=(jax.ShapeDtypeStruct((b * h, tp, dp), dtype),
                   jax.ShapeDtypeStruct((b * h, tp, dp), dtype)),
        grid=(b * h, tp // bk),
        in_specs=[
            pl.BlockSpec((1, bk, dp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # Q
            pl.BlockSpec(memory_space=pl.ANY),  # dO
            pl.BlockSpec(memory_space=pl.ANY),  # lse
            pl.BlockSpec(memory_space=pl.ANY),  # D
        ],
        out_specs=(pl.BlockSpec((1, bk, dp), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, bk, dp), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((bq, dp), dtype),
            pltpu.VMEM((bq, dp), dtype),
            pltpu.VMEM((1, bq), jnp.float32),
            pltpu.VMEM((1, bq), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=jax.default_backend() != "tpu",
    )(kf, vf, qf, gf, lse, dvec)

    def unpad(x, tlim):
        return x[:, :tlim, :d].reshape(b, h, tlim, d)

    return unpad(dq, t), unpad(dk, tk), unpad(dv, tk)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


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
