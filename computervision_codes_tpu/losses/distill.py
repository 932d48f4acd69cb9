"""Knowledge-distillation losses.

* ``distill_kl``: Hinton soft-label KL (reference DistillKL,
  MT4MTLKD/Spatial_cnn/run.py:284-295): KL(log_softmax(s/T) ||
  softmax(t/T)) summed, scaled by T²/B. NOTE the reference feeds
  *sigmoid-activated* teacher predictions as ``y_t``
  (run.py:180-182) — callers must do the same for parity.
* ``mse_feature_kd``: MSE feature-matching KD (run.py:187-191,
  torch.nn.MSELoss default mean reduction).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def distill_kl(y_s: jnp.ndarray, y_t: jnp.ndarray, temperature: float = 4.0) -> jnp.ndarray:
    y_s = y_s.astype(jnp.float32)
    y_t = y_t.astype(jnp.float32)
    t = temperature
    log_p_s = jax.nn.log_softmax(y_s / t, axis=1)
    p_t = jax.nn.softmax(y_t / t, axis=1)
    # torch F.kl_div(input, target, size_average=False) = sum target*(log target - input)
    kl = p_t * (jnp.log(jnp.clip(p_t, 1e-12)) - log_p_s)
    return jnp.sum(kl) * (t ** 2) / y_s.shape[0]


def mse_feature_kd(student_feat: jnp.ndarray, teacher_feat: jnp.ndarray) -> jnp.ndarray:
    diff = student_feat.astype(jnp.float32) - teacher_feat.astype(jnp.float32)
    return jnp.mean(diff ** 2)
