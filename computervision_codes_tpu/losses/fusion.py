"""Multi-scale FPN fusion loss for the temporal TCN stages.

Parity target: the ``fusion`` + per-level BCE loop of the TCN drivers
(MT4MTLKD/Temporal_tenco/run.py:159-212; same in
TERL/0_5fold_TCN_black/run.py:273-343). Semantics:

  * each pyramid level's logits are compared against the labels; when a
    level's length differs from the label length, the *labels* are
    nearest-resized to the level length (run.py:173-175; with the default
    non-hierarchical config all levels share T and no resize happens);
  * per-level mean BCE, summed over levels;
  * total = 0.1 * (loss_i + loss_v + loss_t) + loss_ivt (run.py:212). The
    component weight is the driver's --comp_weight flag.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp

from ..models.common import interpolate_1d
from .bce import bce_with_logits


def _resize_labels(labels: jnp.ndarray, length: int) -> jnp.ndarray:
    # labels (B, T, C) -> (B, length, C) nearest (torch asymmetric rule)
    if labels.shape[1] == length:
        return labels
    lt = interpolate_1d(jnp.swapaxes(labels, 1, 2), length, "nearest")
    return jnp.swapaxes(lt, 1, 2)


def fpn_level_loss(levels: Sequence[jnp.ndarray], labels: jnp.ndarray,
                   pos_weight=None, frame_mask: Optional[jnp.ndarray] = None
                   ) -> jnp.ndarray:
    """Sum of mean BCE over pyramid levels.

    levels: (B, T_l, C); labels (T, C) or (B, T, C) — a (T, C) label is
    broadcast across the batch. ``frame_mask`` (T,) excludes padded frames
    (static-shape batching of variable-length videos); for pooled/hier
    levels with T_l != T the mask is nearest-resized alongside the labels.
    """
    if labels.ndim == 2:
        labels = labels[None]
    total = 0.0
    for lvl in levels:
        la = _resize_labels(labels, lvl.shape[1])
        la = jnp.broadcast_to(la, (lvl.shape[0],) + la.shape[1:])
        loss = bce_with_logits(lvl, la, pos_weight=pos_weight,
                               reduction="none")
        if frame_mask is not None:
            fm = frame_mask.astype(jnp.float32)[None, :, None]
            fm = _resize_labels(fm, lvl.shape[1])
            total = total + jnp.sum(loss * fm) / jnp.maximum(
                jnp.sum(fm) * lvl.shape[0] * la.shape[2], 1.0)
        else:
            total = total + jnp.mean(loss)
    return total


def tcn_multitask_loss(outputs: Dict[str, List[jnp.ndarray]],
                       labels: Dict[str, jnp.ndarray],
                       comp_weight: float = 0.1,
                       pos_weights: Optional[Dict] = None,
                       frame_mask: Optional[jnp.ndarray] = None) -> Dict:
    """0.1*(i+v+t)+ivt over all pyramid levels (run.py:196-212)."""
    pos_weights = pos_weights or {}
    parts = {}
    for task in ("ivt", "i", "v", "t"):
        parts[task] = fpn_level_loss(outputs[task], labels[task],
                                     pos_weight=pos_weights.get(task),
                                     frame_mask=frame_mask)
    total = comp_weight * (parts["i"] + parts["v"] + parts["t"]) + parts["ivt"]
    parts["total"] = total
    return parts
