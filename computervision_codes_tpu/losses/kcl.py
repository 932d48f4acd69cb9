"""k-positive contrastive losses (TERL tail-enhanced representation learning).

Parity targets: TERL/6_baseline_learnT/loss.py — ``KCL`` (:72-117),
``KCLProto`` (:120-163), ``SupConLoss_ccl`` (:166-190), ``SupConLoss_rank``
(:193-227), ``LDAMLoss`` (:8-30).

XLA-native re-design notes:
  * The reference samples k positives per anchor with a k-iteration python
    loop of uniform draws over each anchor's positive set (with replacement,
    duplicates collapsed). Here each draw is one ``jax.random.categorical``
    over the positive mask — identical distribution, fixed shapes.
  * ``KCLProto`` filters anchors with no positives via data-dependent
    ``torch.where`` row selection; XLA keeps static shapes, so invalid rows
    are masked out of the sum and the normalizer counts valid rows — same
    value, no dynamic shapes.
  * logits layout matches MoCo: column 0 is the positive pair similarity,
    columns 1..K the queue (mask gets a ones-column prepended,
    loss.py:111).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def k_positive_mask(rng: jax.Array, mask: jnp.ndarray, k: int) -> jnp.ndarray:
    """Sample up to k positives per row from a {0,1} mask (union of k draws)."""
    logits = jnp.where(mask > 0, 0.0, -jnp.inf)
    has_pos = (mask.sum(axis=1) > 0).astype(mask.dtype)
    out = jnp.zeros_like(mask)
    for i in range(k):
        sub = jax.random.fold_in(rng, i)
        idx = jax.random.categorical(sub, logits, axis=-1)
        onehot = jax.nn.one_hot(idx, mask.shape[1], dtype=mask.dtype)
        out = jnp.maximum(out, onehot * has_pos[:, None])
    return out


def _log_prob(logits: jnp.ndarray) -> jnp.ndarray:
    # reference: F.normalize(logits.exp(), dim=1, p=1).log() == log_softmax
    return jax.nn.log_softmax(logits, axis=1)


def kcl_loss(rng: jax.Array, logits: jnp.ndarray, pos_mask: jnp.ndarray,
             k: int = 7, temperature: float = 0.07,
             anchor_valid=None) -> jnp.ndarray:
    """KCL over MoCo logits (B, 1+K); pos_mask (B, K) marks queue positives.

    ``anchor_valid`` (B,) excludes padded anchors (static-shape batching of
    the reference's variable-length anchor set).
    """
    logits = logits.astype(jnp.float32) / temperature
    sampled = k_positive_mask(rng, pos_mask.astype(jnp.float32), k) if k > 0 \
        else pos_mask.astype(jnp.float32)
    ones = jnp.ones((sampled.shape[0], 1), sampled.dtype)
    mask = jnp.concatenate([ones, sampled], axis=1)
    lp = _log_prob(logits)
    per_anchor = jnp.sum(mask * lp, axis=1) / jnp.sum(mask, axis=1)
    if anchor_valid is None:
        return -jnp.sum(per_anchor) / mask.shape[0]
    v = anchor_valid.astype(jnp.float32)
    return -jnp.sum(per_anchor * v) / jnp.maximum(jnp.sum(v), 1.0)


def kcl_proto_loss(rng: jax.Array, logits: jnp.ndarray, proto_mask: jnp.ndarray,
                   k: int = 7, temperature: float = 0.07) -> jnp.ndarray:
    """KCL against class prototypes; anchors without positives contribute 0.

    logits (B, P) similarity to P prototypes; proto_mask (B, P) positive map.
    """
    logits = logits.astype(jnp.float32) / temperature
    proto_mask = proto_mask.astype(jnp.float32)
    valid = proto_mask.sum(axis=1) > 0
    n_valid = jnp.sum(valid)
    sampled = k_positive_mask(rng, proto_mask, k) if k > 0 else proto_mask
    lp = _log_prob(logits)
    denom = jnp.maximum(jnp.sum(sampled, axis=1), 1.0)
    per_anchor = jnp.sum(sampled * lp, axis=1) / denom
    total = -jnp.sum(jnp.where(valid, per_anchor, 0.0))
    return jnp.where(n_valid > 0, total / jnp.maximum(n_valid, 1), 0.0)


def supcon_ccl_loss(logits: jnp.ndarray, label_mask: jnp.ndarray,
                    cluster_mask: jnp.ndarray, gamma: float = 0.2,
                    temperature: float = 0.07) -> jnp.ndarray:
    """Cluster + label supervised-contrastive mix (loss.py:166-190)."""
    lp = _log_prob(logits.astype(jnp.float32) / temperature)
    ones = jnp.ones((logits.shape[0], 1), jnp.float32)
    lm = jnp.concatenate([ones, label_mask.astype(jnp.float32)], axis=1)
    cm = jnp.concatenate([ones, cluster_mask.astype(jnp.float32)], axis=1)
    loss_label = -jnp.sum(jnp.sum(lm * lp, 1) / jnp.sum(lm, 1)) / lm.shape[0]
    loss_cluster = -jnp.sum(jnp.sum(cm * lp, 1) / jnp.sum(cm, 1)) / cm.shape[0]
    return loss_cluster + gamma * loss_label


def supcon_rank_loss(logits: jnp.ndarray, label_mask: jnp.ndarray,
                     cluster_mask: jnp.ndarray, temperature: float = 0.07,
                     ranking_temperature: float = 0.12,
                     gamma: float = 0.2) -> jnp.ndarray:
    """Ranking variant (loss.py:193-227): label positives compete only
    outside the anchor's cluster."""
    B = logits.shape[0]
    logits = logits.astype(jnp.float32)
    ones = jnp.ones((B, 1), jnp.float32)
    cm = cluster_mask.astype(jnp.float32)
    cm_full = jnp.concatenate([ones, cm], axis=1)
    lp_cluster = _log_prob(logits / temperature)
    loss_cluster = -jnp.sum(jnp.sum(cm_full * lp_cluster, 1)
                            / jnp.sum(cm_full, 1)) / B

    inverse = 1.0 - cm
    lm = inverse * label_mask.astype(jnp.float32)
    lm_full = jnp.concatenate([ones, lm], axis=1)
    inv_full = jnp.concatenate([ones, inverse], axis=1)
    z = logits / ranking_temperature
    log_denom = jnp.log(jnp.sum(jnp.exp(z) * inv_full, axis=1, keepdims=True))
    log_label_prob = z - log_denom
    loss_label = -jnp.sum(jnp.sum(lm_full * log_label_prob, 1)
                          / jnp.maximum(jnp.sum(lm_full, 1), 1e-12)) / B
    return loss_cluster + gamma * loss_label


def ldam_loss(logits: jnp.ndarray, target: jnp.ndarray, cls_num_list,
              max_m: float = 0.5, s: float = 30.0,
              weight=None) -> jnp.ndarray:
    """Label-distribution-aware margin loss (loss.py:8-30; vendored-unused in
    the reference but part of its API surface). ``target`` is int class ids."""
    m_list = 1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(cls_num_list, jnp.float32)))
    m_list = m_list * (max_m / jnp.max(m_list))
    index = jax.nn.one_hot(target, logits.shape[1], dtype=jnp.float32)
    batch_m = index @ m_list
    x_m = logits - batch_m[:, None]
    out = jnp.where(index > 0, x_m, logits)
    logp = jax.nn.log_softmax(s * out, axis=1)
    nll = -jnp.sum(index * logp, axis=1)
    if weight is not None:
        w = jnp.asarray(weight, jnp.float32)[target]
        return jnp.sum(nll * w) / jnp.sum(w)
    return jnp.mean(nll)
