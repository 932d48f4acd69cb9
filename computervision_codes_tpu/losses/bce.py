"""Binary cross-entropy with logits (+ the reference's class pos-weights).

Parity target: torch.nn.BCEWithLogitsLoss(pos_weight=...) as used in every
driver (e.g. MT4MTLKD/Spatial_cnn/run.py:323-326). Numerically stable
formulation; mean reduction over all elements.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

# Constant per-class positive weights "from average of the random sampling of
# the dataset" (MT4MTLKD/Spatial_cnn/run.py:305-310) — dataset statistics, not
# code. Used by the spatial drivers for the i/v/t heads.
TOOL_POS_WEIGHT = (0.93487068, 0.94234964, 0.93487068, 1.18448115, 1.02368339,
                   0.97974447)
VERB_POS_WEIGHT = (0.60002400, 0.60002400, 0.60002400, 0.61682467, 0.67082683,
                   0.80163207, 0.70562823, 2.11208448, 2.69230769, 0.60062402)
TARGET_POS_WEIGHT = (0.49752894, 0.52041527, 0.49752894, 0.51394739, 2.71899565,
                     1.75577963, 0.58509403, 1.25228034, 0.49752894, 2.42993134,
                     0.49802647, 0.87266576, 1.36074165, 0.50150917, 0.49802647)


def bce_with_logits(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    pos_weight: Optional[jnp.ndarray] = None,
    weight: Optional[jnp.ndarray] = None,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Elementwise -[w_p·y·log σ(x) + (1-y)·log(1-σ(x))], torch-compatible.

    Stable form: (1-y)·x + (1 + (w_p-1)·y) · softplus(-x) ... rearranged to
    the exact torch formulation log_weight * (log(1+exp(-|x|)) + max(-x, 0))
    - is used below.
    """
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    if pos_weight is None:
        log_weight = jnp.ones_like(logits)
    else:
        pw = jnp.asarray(pos_weight, jnp.float32)
        log_weight = 1.0 + (pw - 1.0) * targets
    # loss = (1 - y) * x + log_weight * (softplus(-|x|) + relu(-x))
    loss = (1.0 - targets) * logits + log_weight * (
        jnp.log1p(jnp.exp(-jnp.abs(logits))) + jnp.maximum(-logits, 0.0)
    )
    if weight is not None:
        loss = loss * jnp.asarray(weight, jnp.float32)
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    if reduction == "none":
        return loss
    raise ValueError(f"unknown reduction {reduction!r}")
