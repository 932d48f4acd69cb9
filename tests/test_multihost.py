"""Multi-host input sharding (data/multihost.py).

Pure-function properties (disjoint/covering/balanced shards) plus the
global-array assembly on the 8-virtual-device CPU mesh (process_count=1 —
the most a single container can simulate; the pod case differs only in
jax.process_count()).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from computervision_codes_tpu.data.multihost import (
    form_global_batch,
    local_batch_size,
    shard_videos,
)
from computervision_codes_tpu.parallel.mesh import make_mesh


VIDEOS = [f"VID{i:02d}" for i in range(1, 21)]


def test_shard_videos_disjoint_and_covering():
    for n in (1, 2, 3, 4, 7):
        shards = [shard_videos(VIDEOS, h, n) for h in range(n)]
        flat = sorted(v for s in shards for v in s)
        assert flat == sorted(VIDEOS)


def test_shard_videos_balanced_by_frames():
    rng = np.random.default_rng(0)
    counts = {v: int(rng.integers(100, 3000)) for v in VIDEOS}
    n = 4
    shards = [shard_videos(VIDEOS, h, n, counts) for h in range(n)]
    flat = sorted(v for s in shards for v in s)
    assert flat == sorted(VIDEOS)
    loads = [sum(counts[v] for v in s) for s in shards]
    # LPT guarantee: max load <= (4/3) * optimal >= mean
    assert max(loads) <= 4 / 3 * (sum(loads) / n) + max(counts.values()) / n


def test_shard_videos_deterministic_across_hosts():
    counts = {v: len(v) * 7 + i for i, v in enumerate(VIDEOS)}
    a = [shard_videos(VIDEOS, h, 3, counts) for h in range(3)]
    b = [shard_videos(VIDEOS, h, 3, counts) for h in range(3)]
    assert a == b


def test_local_batch_size():
    assert local_batch_size(32, 0, 4) == 8
    with pytest.raises(ValueError):
        local_batch_size(30, 0, 4)
    with pytest.raises(ValueError):
        shard_videos(VIDEOS, 4, 4)


def test_form_global_batch_on_virtual_mesh():
    mesh = make_mesh(n_data=8)
    b = local_batch_size(16, 0, 1)  # single-process: host owns all 16
    batch = {"image": np.arange(16 * 3, dtype=np.float32).reshape(16, 3),
             "label_ivt": np.ones((16, 100), np.float32)}
    g = form_global_batch(mesh, batch)
    assert g["image"].shape == (16, 3)
    assert len(g["image"].sharding.device_set) == 8
    # values survive the re-layout
    np.testing.assert_array_equal(np.asarray(g["image"]), batch["image"])
    # and a jitted sum over the sharded axis works
    total = jax.jit(lambda x: jnp.sum(x))(g["image"])
    assert float(total) == float(batch["image"].sum())
    assert b == 16
