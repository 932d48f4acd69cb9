"""Bank-based component mappings used in losses (vectorized).

The reference maps triplet logits onto component (i/v/t) logits with an
explicit python loop of ``torch.max(logit_ivt[:, idxes])`` per component
class (TERL/6_baseline_learnT/run.py:282-294). Here it is a single masked
segment-max over the (100, C) projection matrix — XLA fuses it into the
surrounding graph.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..data import bank as bank_mod


def component_max_logits(ivt_logits: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """(..., 100) triplet logits -> {'i': (..., 6), 'v': (..., 10), 't': (..., 15)}."""
    out = {}
    for comp in ("i", "v", "t"):
        proj = jnp.asarray(bank_mod.component_projection(comp))  # (100, C)
        masked = jnp.where(proj > 0, ivt_logits[..., None], -jnp.inf)
        out[comp] = jnp.max(masked, axis=-2)
    return out


def component_labels(ivt_labels: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Multi-hot triplet labels -> component multi-hot labels (max/OR)."""
    out = {}
    for comp in ("i", "v", "t"):
        proj = jnp.asarray(bank_mod.component_projection(comp))
        out[comp] = jnp.max(ivt_labels[..., None] * proj, axis=-2)
    return out
