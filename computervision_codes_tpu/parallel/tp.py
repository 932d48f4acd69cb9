"""Tensor parallelism over the mesh's ``model`` axis.

The reference has no working multi-device path at all
(MT4MTLKD/Spatial_cnn/run.py:125 ``FLAGS.multigpu ... # not yet
implemented!``; TERL/6_baseline_learnT/models/moco.py:409-421 stubbed DDP
helpers) — its transformer sizes are chosen to fit one GPU. Here tensor
parallelism is pure data placement, the idiomatic TPU way: parameters are
``device_put`` with PartitionSpecs over the ``model`` axis of the standard
mesh (parallel/mesh.py) and every train/eval step stays a plain jitted
function — GSPMD propagates the shardings through the computation and
inserts the all-reduces, which ride ICI. No model code changes, and TP
composes freely with the ``data`` axis (DP) on the same mesh.

Sharding scheme (Megatron-style column->row pairs, expressed as GSPMD
placements; see jax-ml.github.io/scaling-book):

  * MLP / FFN pairs: the first Dense kernel is COLUMN-split (output axis,
    bias with it), the second ROW-split (input axis) — the hidden
    activation (4C in Swin, 8192 in the Q2L transformer) lives sharded
    and a single all-reduce closes the pair.
  * Q2L attention: q/k/v kernels are column-split — heads stay contiguous
    because the (B, N, h, hd) reshape keeps heads major, so each shard
    holds whole heads when ``n_model`` divides ``num_heads`` — and
    out_proj is row-split, closing the block with one all-reduce.
  * Swin window attention: the fused qkv packs its output as
    (3, heads, hd), so a contiguous column split would straddle q/k/v;
    qkv and proj are ROW-split instead (partial sums over the input axis,
    one all-reduce each) and the tiny window einsums (N = 49/64) run
    replicated, which is where they are cheap.
  * Everything else (convs, norms, bias tables, queries, heads) is
    replicated — at these model scales their memory is noise.

Any rule whose sharded dimension is not divisible by the mesh's model-axis
size falls back to replication for that leaf (nano test models stay
valid on any mesh).

The same suffix rules apply to ANY pytree whose leaf paths end with the
parameter names — optimizer momentum (optax trace mirrors the param tree)
and EMA copies shard identically for free.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# (module-name, leaf-name) suffix -> (sharded_axis_index, kind)
# kind "col": split the OUTPUT axis (last); kind "row": split the INPUT
# axis (first). Biases listed explicitly where they follow a column split.
_COL = "col"
_ROW = "row"

_RULES: Tuple[Tuple[Tuple[str, str], str], ...] = (
    # Swin window attention: fused qkv output is (3, h, hd)-packed ->
    # row-split both GEMMs (see module docstring).
    (("qkv", "kernel"), _ROW),
    (("proj", "kernel"), _ROW),
    # Swin MLP (flax auto-names inside the Mlp module).
    (("Dense_0", "kernel"), _COL),
    (("Dense_0", "bias"), _COL),
    (("Dense_1", "kernel"), _ROW),
    # Q2L/DETR attention: separable projections, heads-major reshape.
    (("q_proj", "kernel"), _COL),
    (("q_proj", "bias"), _COL),
    (("k_proj", "kernel"), _COL),
    (("k_proj", "bias"), _COL),
    (("v_proj", "kernel"), _COL),
    (("v_proj", "bias"), _COL),
    (("out_proj", "kernel"), _ROW),
    # Q2L/DETR FFN (8192 hidden).
    (("linear1", "kernel"), _COL),
    (("linear1", "bias"), _COL),
    (("linear2", "kernel"), _ROW),
)


def _path_names(path) -> Tuple[str, ...]:
    names = []
    for k in path:
        if isinstance(k, jax.tree_util.DictKey):
            names.append(str(k.key))
        elif isinstance(k, jax.tree_util.GetAttrKey):
            names.append(k.name)
        elif isinstance(k, jax.tree_util.SequenceKey):
            names.append(str(k.idx))
        else:  # pragma: no cover - future key kinds
            names.append(str(k))
    return tuple(names)


def tp_spec(path, value, n_model: int) -> P:
    """PartitionSpec for one leaf under the suffix rules (replicated if no
    rule matches or the sharded dim is not divisible by ``n_model``)."""
    shape = jnp.shape(value)
    names = _path_names(path)
    if len(names) < 2 or n_model <= 1:
        return P()
    suffix = (names[-2], names[-1])
    for rule_suffix, kind in _RULES:
        if suffix != rule_suffix:
            continue
        if kind == _COL:
            axis = len(shape) - 1  # output features (also works for bias)
        else:
            axis = 0  # input features
        if len(shape) <= axis or shape[axis] % n_model:
            return P()
        spec = [None] * len(shape)
        spec[axis] = MODEL_AXIS
        return P(*spec)
    return P()


def tp_shardings(tree, mesh: Mesh):
    """NamedSharding pytree for ``tree`` (params, momentum, EMA, ...)."""
    n_model = mesh.shape[MODEL_AXIS]
    return jax.tree_util.tree_map_with_path(
        lambda path, v: NamedSharding(mesh, tp_spec(path, v, n_model)), tree)


def shard_params_tp(tree, mesh: Mesh):
    """Place a param-like pytree on ``mesh`` under the TP rules."""
    return jax.tree.map(jax.device_put, tree, tp_shardings(tree, mesh))


def shard_state_tp(state, mesh: Mesh):
    """Place a full TrainState: params/opt_state under the TP suffix rules
    (optax traces mirror param names, so they shard identically), scalars
    and everything unmatched replicated."""
    return jax.tree_util.tree_map_with_path(
        lambda path, v: jax.device_put(
            v, NamedSharding(mesh, tp_spec(path, v, mesh.shape[MODEL_AXIS]))),
        state)


def sharded_leaf_count(tree) -> int:
    """How many leaves actually carry a model-axis split (attestation)."""
    count = 0
    for path, v in jax.tree_util.tree_leaves_with_path(tree):
        sh = getattr(v, "sharding", None)
        if isinstance(sh, NamedSharding) and MODEL_AXIS in jax.tree.leaves(
                tuple(sh.spec)):
            count += 1
    return count
