"""Device mesh + sharding helpers (the distributed layer the reference lacks).

The reference has NO working multi-device path — `FLAGS.multigpu ... # not
yet implemented!` (MT4MTLKD/Spatial_cnn/run.py:125), stubbed DDP helpers
(TERL/6_baseline_learnT/models/moco.py:409-421). Here multi-chip is
first-class: a named `jax.sharding.Mesh` with

  * ``data``  — batch/data parallelism (gradient all-reduce rides ICI);
  * ``seq``   — optional sequence/context parallelism for the full-video
    temporal models (frames sharded across chips);
  * ``model`` — reserved tensor-parallel axis (models at this scale don't
    need it; the axis exists so larger backbones can shard without API
    change).

Training steps are plain jitted functions with sharding-annotated inputs;
XLA inserts the collectives. BatchNorm under a sharded batch axis reduces
over the GLOBAL batch (XLA all-reduces the moments), i.e. cross-replica
SyncBN for free — the reference's commented-out `nn.SyncBatchNorm`
(TERL/0_5fold_TCN_black/run.py:452) is the default here.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SEQ_AXIS = "seq"
MODEL_AXIS = "model"


def make_mesh(n_data: Optional[int] = None, n_seq: int = 1, n_model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_seq * n_model)
    need = n_data * n_seq * n_model
    if need > len(devices):
        raise ValueError(f"mesh {n_data}x{n_seq}x{n_model} needs {need} "
                         f"devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(n_data, n_seq, n_model)
    return Mesh(arr, (DATA_AXIS, SEQ_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis split over the data axis, rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def seq_sharding(mesh: Mesh) -> NamedSharding:
    """(B, T, ...) with T split over the seq axis (context parallelism)."""
    return NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch pytree with the data axis split."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
