"""Context (sequence) parallelism for full-video temporal models.

The reference bounds video length by single-GPU memory (random training
windows, full-video eval on one device — SURVEY.md §5 long-context). Here
the sequence axis is a first-class mesh dimension:

  * ``sequence_parallel_attention`` — each chip holds a T/n slice of the
    q/k/v sequence; keys/values are all-gathered over the ``seq`` axis (one
    ICI collective) and attention runs on local queries. Exact attention,
    memory O(T·T/n) per chip. (A ring variant via ppermute is the next
    optimization; the all-gather form is already exact and bandwidth-light
    for the ~1-6k-frame surgical videos.)
  * ``halo_exchange`` — neighbor exchange (ppermute) of ``halo`` boundary
    frames so seq-sharded dilated/temporal convolutions compute exactly the
    same values as the unsharded op.

Both are pure shard_map bodies; see tests/test_parallel.py for the
8-virtual-device parity checks.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from .mesh import SEQ_AXIS


def _local_attention(q, k, v):
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def sequence_parallel_attention(q: jnp.ndarray, k: jnp.ndarray,
                                v: jnp.ndarray, mesh: Mesh,
                                axis: str = SEQ_AXIS) -> jnp.ndarray:
    """Exact attention with (B, H, T, D) sharded over T on ``axis``."""

    def body(q, k, v):
        kg = jax.lax.all_gather(k, axis, axis=2, tiled=True)
        vg = jax.lax.all_gather(v, axis, axis=2, tiled=True)
        return _local_attention(q, kg, vg)

    spec = P(None, None, axis, None)
    fn = shard_map(body, mesh=mesh, in_specs=(spec, spec, spec),
                   out_specs=spec)
    return fn(q, k, v)


def halo_exchange(x: jnp.ndarray, halo: int, axis_name: str = SEQ_AXIS,
                  time_axis: int = 1) -> jnp.ndarray:
    """Inside shard_map: prepend/append ``halo`` frames from neighbors.

    x local shape (..., T_local, ...); returns (..., T_local + 2*halo, ...)
    with zero padding at the global sequence boundaries.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    def take(x, sl):
        slicer = [slice(None)] * x.ndim
        slicer[time_axis] = sl
        return x[tuple(slicer)]

    last = take(x, slice(-halo, None))
    first = take(x, slice(0, halo))
    # receive the left neighbor's tail and the right neighbor's head
    from_left = jax.lax.ppermute(last, axis_name,
                                 [(i, (i + 1) % n) for i in range(n)])
    from_right = jax.lax.ppermute(first, axis_name,
                                  [(i, (i - 1) % n) for i in range(n)])
    # zero the wrap-around at global boundaries
    zero = jnp.zeros_like(from_left)
    from_left = jnp.where(idx == 0, zero, from_left)
    from_right = jnp.where(idx == n - 1, zero, from_right)
    return jnp.concatenate([from_left, x, from_right], axis=time_axis)


def sequence_parallel_dilated_conv(x: jnp.ndarray, w_taps: jnp.ndarray,
                                   b1: jnp.ndarray, dilation: int,
                                   mesh: Mesh, axis: str = SEQ_AXIS
                                   ) -> jnp.ndarray:
    """Seq-sharded width-3 dilated conv (pre-activation), exact parity.

    x (B, T, C) sharded over T. Requires T_local >= dilation on every chip.
    """
    d = dilation

    def body(x, w_taps, b1):
        xp = halo_exchange(x, d, axis, time_axis=1)
        t = x.shape[1]
        return (xp[:, :t] @ w_taps[0] + xp[:, d:d + t] @ w_taps[1]
                + xp[:, 2 * d:2 * d + t] @ w_taps[2] + b1)

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(None, axis, None), P(), P()),
                   out_specs=P(None, axis, None))
    return fn(x, w_taps, b1)


def all_gather_keys(keys: jnp.ndarray, labels: jnp.ndarray,
                    valid: jnp.ndarray, axis_name: str):
    """MoCo queue all-gather: collect every chip's anchor keys before the
    enqueue — the REAL version of the reference's identity stub
    (TERL/6_baseline_learnT/models/moco.py:409-421 ``concat_all_gather``).
    Call inside a shard_map/pmap body over the data axis.
    """
    g = lambda t: jax.lax.all_gather(t, axis_name, axis=0, tiled=True)
    return g(keys), g(labels), g(valid)
