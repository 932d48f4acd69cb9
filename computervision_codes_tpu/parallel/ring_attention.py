"""Ring attention: exact attention over a sequence-sharded ring of chips.

For sequences where even the all-gathered K/V don't fit one chip
(parallel/context.py gathers K/V; fine for CholecT45's 1-6k frames, not for
100k+), the ring form keeps K/V sharded: each step computes attention of the
local queries against the resident K/V block, then rotates K/V one hop
around the ``seq`` ring (jax.lax.ppermute over ICI), carrying the
flash-attention running statistics (row max m, normalizer l, weighted
accumulator) so the result is EXACT:

    m' = max(m, rowmax(s));  c = exp(m - m')
    acc' = acc * c + exp(s - m') @ V_r;  l' = l * c + rowsum(exp(s - m'))

Peak memory per chip: O(T/n · (T/n + D)) — independent of total T for
fixed per-chip shard. Exactness tested on the virtual 8-device mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from .mesh import SEQ_AXIS


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   mesh: Mesh, axis: str = SEQ_AXIS) -> jnp.ndarray:
    """Exact attention with (B, H, T, D) q/k/v sharded over T on ``axis``."""

    def body(q, k, v):
        n = jax.lax.axis_size(axis)
        scale = q.shape[-1] ** -0.5
        qf = q.astype(jnp.float32) * scale
        m = jnp.full(q.shape[:-1], -jnp.inf, jnp.float32)  # (B, H, Tq)
        l = jnp.zeros(q.shape[:-1], jnp.float32)
        acc = jnp.zeros(q.shape, jnp.float32)
        perm = [(i, (i + 1) % n) for i in range(n)]

        def step(carry, _):
            m, l, acc, k_r, v_r = carry
            s = jnp.einsum("bhqd,bhkd->bhqk", qf, k_r.astype(jnp.float32))
            m_new = jnp.maximum(m, jnp.max(s, axis=-1))
            c = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new[..., None])
            acc = acc * c[..., None] + jnp.einsum(
                "bhqk,bhkd->bhqd", p, v_r.astype(jnp.float32))
            l = l * c + jnp.sum(p, axis=-1)
            k_r = jax.lax.ppermute(k_r, axis, perm)
            v_r = jax.lax.ppermute(v_r, axis, perm)
            return (m_new, l, acc, k_r, v_r), None

        (m, l, acc, _, _), _ = jax.lax.scan(step, (m, l, acc, k, v),
                                            None, length=n)
        return (acc / l[..., None]).astype(q.dtype)

    spec = P(None, None, axis, None)
    fn = shard_map(body, mesh=mesh, in_specs=(spec, spec, spec),
                   out_specs=spec, check_rep=False)
    return fn(q, k, v)
