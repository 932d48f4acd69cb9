"""Learning-rate schedules (reference optimizer recipe).

Every reference driver uses: SGD at base lr = peak/power, LinearLR warmup
(start_factor=power over ``warmup`` epochs) chained into per-epoch
ExponentialLR decay via SequentialLR with milestone warmup+1
(MT4MTLKD/Spatial_cnn/run.py:342-351; SURVEY.md §2.3).

Resulting per-epoch lr (wp = peak_lr / power), verified step-for-step
against torch's SequentialLR in tests/test_train.py (note the peak holds
for one extra epoch because the milestone is warmup+1):
  epoch e <= warmup     : wp * (power + (1 - power) * e / warmup)
  epoch e == warmup + 1 : wp
  epoch e >  warmup + 1 : wp * decay_rate ** (e - warmup - 1)

Schedules are expressed per optimizer step (optax convention); the epoch is
derived from ``step // steps_per_epoch`` so the lr changes exactly at epoch
boundaries like the reference's per-epoch ``scheduler.step()``.
"""

from __future__ import annotations

import jax.numpy as jnp


def reference_warmup_exp_schedule(peak_lr: float, power: float,
                                  warmup_epochs: int, decay_rate: float,
                                  steps_per_epoch: int):
    wp = peak_lr / power
    warmup = max(int(warmup_epochs), 1)

    def schedule(step):
        e = jnp.asarray(step, jnp.float32) // steps_per_epoch
        warm = wp * (power + (1.0 - power) * jnp.minimum(e, warmup) / warmup)
        decay = wp * jnp.power(decay_rate, jnp.maximum(e - warmup - 1, 0.0))
        return jnp.where(e <= warmup, warm, decay)

    return schedule
