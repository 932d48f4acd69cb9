"""Train state: params + BN stats + optimizer state + rng, one pytree.

Replaces the reference's scattered model/optimizer/scheduler objects
(MT4MTLKD/Spatial_cnn/run.py:313-351) with a single functional state that
jit/pjit can thread through steps. Grad clearing (`param.grad = None`,
run.py:213-215) has no analogue — gradients are pure values.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from flax import struct
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None
    # FrozenBatchNorm constants (Q2L ResNet backbones keep BN affine +
    # running stats in a non-trainable 'frozen' collection)
    frozen: Any = None
    rng: Optional[jax.Array] = struct.field(default=None)

    def variables(self):
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        if self.frozen is not None:
            v["frozen"] = self.frozen
        return v

    def next_rng(self):
        """Split the carried rng; returns (new_state, step_rng)."""
        new, step = jax.random.split(self.rng)
        return self.replace(rng=new), step
