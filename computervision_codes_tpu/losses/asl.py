"""Asymmetric focal loss for multi-label classification (ASL).

Parity targets (both variants exist in the reference):
  * MT4MTLKD variant (Spatial_transformer/models/aslloss.py): scalar
    ``-loss.sum()``;
  * TERL variant (TERL/6_baseline_learnT/models/aslloss.py:111-115):
    per-class vector ``-loss.sum(dim=0)/B * 1000`` (call sites take
    ``.mean()``), built with gamma_neg=2, gamma_pos=0, clip=0, eps=1e-5
    (TERL/6_baseline_learnT/run.py:531-536).

One functional implementation with a ``reduction`` switch covers both.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def asymmetric_loss(
    logits: jnp.ndarray,  # (B, C)
    targets: jnp.ndarray,  # (B, C) multi-hot
    gamma_neg: float = 4.0,
    gamma_pos: float = 1.0,
    clip: float = 0.05,
    eps: float = 1e-8,
    reduction: str = "sum",  # 'sum' (MT4MTLKD) | 'terl' (per-class vector)
    sample_weight=None,  # (B,) mask/weight for padded anchors
) -> jnp.ndarray:
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    anti = 1.0 - targets
    xs_pos = jax.nn.sigmoid(logits)
    xs_neg = 1.0 - xs_pos
    if clip and clip > 0:
        xs_neg = jnp.clip(xs_neg + clip, a_max=1.0)
    loss = targets * jnp.log(jnp.clip(xs_pos, a_min=eps))
    loss = loss + anti * jnp.log(jnp.clip(xs_neg, a_min=eps))
    if gamma_neg > 0 or gamma_pos > 0:
        pt = xs_pos * targets + xs_neg * anti
        gamma = gamma_pos * targets + gamma_neg * anti
        # the focal weight is a CONSTANT wrt gradients: the reference runs
        # AsymmetricLossOptimized with disable_torch_grad_focal_loss=True
        # (TERL run.py:531-536, aslloss.py:42-50). Backpropping through
        # jnp.power(1-pt, gamma) would also NaN at saturation when a gamma
        # entry is 0 (d/dx x^0 = 0 * x^-1 = nan at x=0) — observed blowing
        # up TERL training on synthetic data the moment sigmoids saturate.
        loss = loss * jax.lax.stop_gradient(jnp.power(1.0 - pt, gamma))
    if sample_weight is not None:
        w = sample_weight.astype(jnp.float32)[:, None]
        loss = loss * w
        denom = jnp.maximum(jnp.sum(w), 1.0)
    else:
        denom = jnp.asarray(logits.shape[0], jnp.float32)
    if reduction == "sum":
        return -jnp.sum(loss)
    if reduction == "terl":
        return -jnp.sum(loss, axis=0) / denom * 1000.0
    if reduction == "mean_terl":
        return jnp.mean(-jnp.sum(loss, axis=0) / denom * 1000.0)
    raise ValueError(f"unknown reduction {reduction!r}")
