"""Context-parallel full-video evaluation (sequence sharded over chips).

The GSPMD way: put the (B, T, D) feature sequence on the mesh with T split
over the ``seq`` axis, replicate the parameters, and jit the ordinary model
apply — XLA's partitioner inserts the halo exchanges for the temporal
convolutions and the collectives for the T×T attention automatically. The
hand-written shard_map primitives in parallel/context.py remain for custom
schedules (ring attention); this is the zero-code-change path that makes a
video longer than one chip's HBM evaluable today.

Exactness is tested on the virtual 8-device mesh (tests/test_parallel.py).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import SEQ_AXIS


def eval_sharded(apply_fn: Callable, variables, feats: jnp.ndarray,
                 mesh: Mesh, seq_axis: str = SEQ_AXIS):
    """Run ``apply_fn(variables, feats)`` with T sharded over ``seq_axis``.

    ``feats`` (B, T, D); T must be divisible by the seq-axis size. Returns
    whatever apply_fn returns, with sequence outputs sharded the same way.
    """
    seq_sh = NamedSharding(mesh, P(None, seq_axis, None))
    rep = NamedSharding(mesh, P())
    feats = jax.device_put(feats, seq_sh)
    variables = jax.tree.map(lambda x: jax.device_put(x, rep), variables)
    fn = jax.jit(apply_fn, in_shardings=(rep, seq_sh))
    return fn(variables, feats)
