"""Bridge: a real SwinTransformer param tree -> the GPipe pipeline.

SwinL's stage 3 is 18 identical-structure blocks
(MT4MTLKD/Spatial_transformer/models/swin_transformer.py depths=(2,2,18,2))
— the depth that dominates layer count. ``extract_stage_pairs`` collects a
trained model's ``stage{S}_block{d}`` subtrees into stacked shift-pairs
(shift 0 + shift w/2 = one structurally-identical unit, the granularity
SPMD pipelining needs) and ``pipelined_swin_stage`` runs them over the
mesh's ``model`` axis via parallel/pipeline.py.

Eval-path composition (deterministic: DropPath rates are irrelevant).
The blocks run their XLA path inside the pipeline body — composing the
fused Pallas kernels with shard_map stages is an on-chip experiment for a
hardware round (fused_eval=False is forced here).

Exactness: pipelined == the sequential block loop on the same extracted
params (tests/test_pipeline_parallel.py); the model applies these same
SwinBlock modules with these same trees, so the bridge is faithful by
construction.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..models.swin import SwinBlock
from .pipeline import pipeline_blocks, stack_block_params


def extract_stage_pairs(swin_params, stage: int):
    """Stack a stage's ``stage{S}_block{d}`` param subtrees into shift-pair
    units: ``{"a": even(shift 0), "b": odd(shift w/2)}`` stacked along a
    new leading axis. Returns (stacked_pairs, n_blocks)."""
    blocks = []
    d = 0
    while f"stage{stage}_block{d}" in swin_params:
        blocks.append(swin_params[f"stage{stage}_block{d}"])
        d += 1
    if not blocks:
        raise ValueError(f"no stage{stage}_block* in the param tree")
    if len(blocks) % 2:
        raise ValueError(f"stage {stage} has {len(blocks)} blocks — "
                         "pipelining needs whole shift-pairs")
    pairs = [{"a": blocks[i], "b": blocks[i + 1]}
             for i in range(0, len(blocks), 2)]
    return stack_block_params(pairs), len(blocks)


def pipelined_swin_stage(stacked_pairs, x: jnp.ndarray, mesh: Mesh,
                         n_micro: int, *, dim: int, num_heads: int,
                         window: int, mlp_ratio: float = 4.0,
                         dtype=jnp.float32) -> jnp.ndarray:
    """Apply the extracted stage to (B, H, W, dim) with the pair stack
    pipelined over ``mesh.shape['model']`` devices (eval path)."""
    b0 = SwinBlock(dim=dim, num_heads=num_heads, window=window, shift=0,
                   mlp_ratio=mlp_ratio, fused_eval=False, dtype=dtype)
    b1 = SwinBlock(dim=dim, num_heads=num_heads, window=window,
                   shift=window // 2, mlp_ratio=mlp_ratio,
                   fused_eval=False, dtype=dtype)

    def apply_pair(p, act):
        act = b0.apply({"params": p["a"]}, act)
        return b1.apply({"params": p["b"]}, act)

    return pipeline_blocks(apply_pair, stacked_pairs, x, mesh, n_micro)
