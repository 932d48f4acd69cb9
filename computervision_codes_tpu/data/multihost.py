"""Multi-host input sharding: per-host video shards for TPU pod training.

The reference is single-process (SURVEY §5: its DDP/NCCL helpers are dead
stubs, e.g. TERL/6_baseline_learnT/models/moco.py:409-421), so its loaders
always read every video. On a TPU pod each host runs this same program and
must feed ONLY its slice of the global batch; JAX then assembles the
logically-global sharded array (`jax.make_array_from_process_local_data`).

Three pieces, all deterministic in (process_index, process_count) so every
host agrees without communication:

* ``shard_videos``        — partition the video list across hosts, balanced
                            by frame counts when known (LPT greedy) so epoch
                            lengths stay even;
* ``local_batch_size``    — the host's contiguous slice of the global batch;
* ``form_global_batch``   — wrap each per-host numpy batch leaf into the
                            global jax.Array laid out over a mesh axis.

Single-host (process_count == 1) degenerates to the existing behavior, which
is how the unit tests drive it; the functions never touch collectives.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np


def shard_videos(videos: Sequence[str], process_index: int,
                 process_count: int,
                 frame_counts: Optional[Dict[str, int]] = None) -> List[str]:
    """Deterministic partition of ``videos`` over hosts.

    With ``frame_counts`` the assignment is longest-processing-time greedy
    (sort by frames desc, give each video to the currently-lightest host) —
    balanced epoch lengths even when video lengths vary by 10x, as in
    CholecT45 (SURVEY §6). Without counts it is round-robin. Every video is
    assigned to exactly one host; hosts receive disjoint, covering shards.
    """
    if not 0 <= process_index < process_count:
        raise ValueError(f"process_index {process_index} out of range "
                         f"for process_count {process_count}")
    if frame_counts is None:
        return [v for i, v in enumerate(videos)
                if i % process_count == process_index]
    missing = [v for v in videos if v not in frame_counts]
    if missing:
        # a partial metadata cache would otherwise KeyError globally; the
        # assignment must stay identical on every host, so fail loudly
        # rather than guess per-host
        raise ValueError(
            f"frame_counts missing {len(missing)} video(s): "
            f"{missing[:5]}{'...' if len(missing) > 5 else ''} — pass "
            f"complete counts or frame_counts=None for round-robin")
    order = sorted(videos, key=lambda v: (-frame_counts[v], v))
    loads = [0] * process_count
    mine: List[str] = []
    for v in order:
        h = int(np.argmin(loads))
        loads[h] += frame_counts[v]
        if h == process_index:
            mine.append(v)
    return mine


def local_batch_size(global_batch: int, process_index: int,
                     process_count: int) -> int:
    """The host's share of the global batch (global must divide evenly —
    a hard XLA requirement for static shapes under pjit)."""
    del process_index
    if global_batch % process_count:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{process_count} hosts")
    return global_batch // process_count


def form_global_batch(mesh, batch: Dict[str, np.ndarray],
                      axis: str = "data") -> Dict:
    """Assemble per-host numpy batch leaves into global jax.Arrays.

    Each leaf's leading dim is this host's ``local_batch_size``; the result
    is the logically-global array sharded over ``axis`` of ``mesh``. On a
    single-process mesh this is exactly a device_put with the batch
    sharding (the path the drivers' --dp_devices flag uses today).
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P(axis))
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in batch.items()
    }
