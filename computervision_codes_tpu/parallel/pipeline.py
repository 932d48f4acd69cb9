"""Pipeline parallelism (GPipe schedule) over stacked homogeneous blocks.

The reference bounds every model by single-GPU memory and has no
multi-device path at all (MT4MTLKD/Spatial_cnn/run.py:125 ``# not yet
implemented!``); its deepest compute — SwinL stage 3's 18 identical
transformer blocks (MT4MTLKD/Spatial_transformer/models/swin_transformer.py
``depths=(2, 2, 18, 2)``) — therefore caps the resolution x batch product.
Here that block stack can be split across chips as a first-class pipeline:

  * layers are tree-stacked (``stack_block_params``) and the stack's
    leading axis is sharded over the mesh's ``model`` axis — each chip
    holds ``L/D`` consecutive layers;
  * the batch is split into ``n_micro`` microbatches and a ``lax.scan``
    runs the classic GPipe schedule: at step ``t`` chip ``d`` applies its
    layer chunk to microbatch ``t - d``, then hands the activation to chip
    ``d+1`` with ONE ``ppermute`` hop over ICI (neighbour traffic only —
    no all-gathers on the steady path);
  * the bubble is the standard ``(D-1)/(M+D-1)`` — chips idle-compute on
    zero activations while the pipe fills/drains, which is numerically
    harmless (every block here is shape-preserving and zero-safe).

The schedule is exact: outputs equal the sequential layer loop bit-for-bit
up to collective reduction order (tests/test_pipeline_parallel.py attests
with real SwinBlock pairs). Shift-alternating Swin stacks pipeline at the
block-PAIR granularity (shift 0 + shift w/2 = one unit), keeping every
unit's program identical, which is what SPMD pipelining requires.

This composes with the other mesh axes: ``data`` (DP) and ``seq`` shard
the microbatch contents; ``parallel/tp.py`` shards the per-layer weights.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from .mesh import MODEL_AXIS


def stack_block_params(params_seq: Sequence) -> object:
    """Tree-stack per-layer param trees along a new leading (layer) axis.

    All trees must share a structure (homogeneous blocks — for
    shift-alternating Swin stacks, pass PAIRS: ``[{"a": p0, "b": p1}, ...]``
    so each unit is structurally identical).
    """
    return jax.tree.map(lambda *xs: jnp.stack(xs), *params_seq)


def pipeline_blocks(apply_one: Callable, stacked_params, x: jnp.ndarray,
                    mesh: Mesh, n_micro: int,
                    axis: str = MODEL_AXIS) -> jnp.ndarray:
    """Apply ``L`` stacked layers to ``x`` with the layer stack pipelined
    over ``mesh.shape[axis]`` devices (GPipe schedule).

    ``apply_one(params_one, x) -> x`` must be shape-preserving (a residual
    block). ``stacked_params`` leaves have leading dim ``L`` with
    ``L % D == 0``; ``x`` has leading batch dim ``B`` with
    ``B % n_micro == 0``. Returns exactly
    ``functools.reduce(apply_one-over-layers, x)``.
    """
    d = mesh.shape[axis]
    lead = {int(leaf.shape[0]) for leaf in jax.tree.leaves(stacked_params)}
    if len(lead) != 1:
        raise ValueError(f"inconsistent layer-stack leading dims {lead}")
    n_layers = lead.pop()
    if n_layers % d:
        raise ValueError(f"{n_layers} layers not divisible by {d} stages")
    b = x.shape[0]
    if b % n_micro:
        raise ValueError(f"batch {b} not divisible by n_micro {n_micro}")
    mb = b // n_micro

    # (L, ...) -> (D, L/D, ...): stage-major so P(axis) gives each device
    # its consecutive layer chunk
    staged = jax.tree.map(
        lambda leaf: leaf.reshape((d, n_layers // d) + leaf.shape[1:]),
        stacked_params)
    micro = x.reshape((n_micro, mb) + x.shape[1:])
    # DP x PP composition: when the mesh carries a data axis, the
    # microbatch CONTENTS shard over it (each chip sees mb/n_data rows);
    # indivisible mb falls back to replication
    from .mesh import DATA_AXIS

    n_data = mesh.shape.get(DATA_AXIS, 1)
    dshard = DATA_AXIS if (n_data > 1 and mb % n_data == 0) else None

    def body(my_stage_params, micro_local):
        stage = jax.lax.axis_index(axis)
        my_layers = jax.tree.map(lambda leaf: leaf[0], my_stage_params)

        def chunk(act):
            def one(act, p):
                return apply_one(p, act), None
            out, _ = jax.lax.scan(one, act, my_layers)
            return out

        n_steps = n_micro + d - 1
        perm = [(i, (i + 1) % d) for i in range(d)]
        init_out = jnp.zeros_like(micro_local)
        init_carry = jnp.zeros_like(micro_local[0])

        def step(carry, t):
            act, outs = carry
            fresh = jax.lax.dynamic_index_in_dim(
                micro_local, jnp.clip(t, 0, n_micro - 1), keepdims=False)
            act_in = jnp.where(stage == 0, fresh, act)
            act_out = chunk(act_in)
            # fill-phase writes (t < d-1) land zeros at the clamped index 0
            # and are overwritten by the real microbatch-0 result at
            # t = d-1 (scan order is increasing t); non-tail stages only
            # ever write zeros over zeros
            is_tail = jnp.logical_and(stage == d - 1, t >= d - 1)
            idx = jnp.clip(t - (d - 1), 0, n_micro - 1)
            write = jnp.where(is_tail, act_out, jnp.zeros_like(act_out))
            outs = jax.lax.dynamic_update_index_in_dim(outs, write, idx, 0)
            act_next = jax.lax.ppermute(act_out, axis, perm)
            return (act_next, outs), None

        (_, outs), _ = jax.lax.scan(step, (init_carry, init_out),
                                    jnp.arange(n_steps))
        # per-stage buffers stack on a new leading axis; only the last
        # stage's is real and the caller indexes it out — NO collective
        # here (a psum would all-reduce D-1 zero buffers over ICI)
        return outs[None]

    fn = shard_map(
        body, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(axis), staged),
                  P(None, dshard)),
        out_specs=P(axis, None, dshard), check_rep=False)
    out = fn(staged, micro)[d - 1]
    return out.reshape((b,) + x.shape[1:])
