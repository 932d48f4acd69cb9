"""Synthetic CholecT45-layout dataset generator for tests and smoke runs.

Writes PNG frames + per-task CSV label files in the exact on-disk layout the
real dataset uses (see labels.py), so every loader/driver code path can be
exercised end-to-end without the (restricted-distribution) real videos.
Labels are generated so that each frame's component labels are consistent
with its triplet label through the bank, which matters for metric tests.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

from .bank import NUM_TARGET, NUM_TOOL, NUM_TRIPLET, NUM_VERB, load_bank


def synthetic_frame(rng: np.random.Generator, height: int, width: int) -> np.ndarray:
    """A small random RGB uint8 frame."""
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def synthetic_labels(rng: np.random.Generator, num_frames: int,
                     max_triplets_per_frame: int = 2) -> dict:
    """Random per-frame multi-hot triplet labels + bank-consistent components."""
    bank = load_bank()
    triplet = np.zeros((num_frames, NUM_TRIPLET), dtype=np.int64)
    tool = np.zeros((num_frames, NUM_TOOL), dtype=np.int64)
    verb = np.zeros((num_frames, NUM_VERB), dtype=np.int64)
    target = np.zeros((num_frames, NUM_TARGET), dtype=np.int64)
    for f in range(num_frames):
        k = int(rng.integers(0, max_triplets_per_frame + 1))
        for t in rng.choice(NUM_TRIPLET, size=k, replace=False):
            triplet[f, t] = 1
            tool[f, bank[t, 1]] = 1
            verb[f, bank[t, 2]] = 1
            target[f, bank[t, 3]] = 1
    return {"triplet": triplet, "tool": tool, "verb": verb, "target": target}


def write_synthetic_dataset(
    root: str,
    videos: Sequence[str],
    frames_per_video: int = 6,
    height: int = 64,
    width: int = 112,
    seed: int = 0,
    frame_stride: int = 25,
    write_images: bool = True,
) -> str:
    """Create a synthetic dataset at ``root`` and return it.

    ``frame_stride`` spaces frame ids like the real dataset (1 fps over
    25 fps video -> ids 0, 25, 50, ... is NOT the real convention; real
    CholecT45 uses consecutive 1-fps ids, but non-contiguous ids exercise the
    id->basename mapping, which only depends on the CSV's first column).
    """
    from PIL import Image

    rng = np.random.default_rng(seed)
    for task_dir in ("triplet", "instrument", "verb", "target"):
        os.makedirs(os.path.join(root, task_dir), exist_ok=True)
    for vi, video in enumerate(videos):
        vid_rng = np.random.default_rng(seed + 1000 + vi)
        labels = synthetic_labels(vid_rng, frames_per_video)
        frame_ids = np.arange(frames_per_video) * frame_stride
        img_dir = os.path.join(root, "data", video)
        if write_images:
            os.makedirs(img_dir, exist_ok=True)
        for f, fid in enumerate(frame_ids):
            if write_images:
                img = Image.fromarray(synthetic_frame(vid_rng, height, width))
                img.save(os.path.join(img_dir, "{}.png".format(str(int(fid)).zfill(6))))
        for task, subdir in (("triplet", "triplet"), ("tool", "instrument"),
                             ("verb", "verb"), ("target", "target")):
            rows = np.concatenate([frame_ids[:, None], labels[task]], axis=1)
            np.savetxt(os.path.join(root, subdir, f"{video}.txt"), rows,
                       fmt="%d", delimiter=",")
    return root


def synthetic_feature_dict(videos: Sequence[str], num_frames: int, dim: int,
                           seed: int = 0) -> dict:
    """Random cached-feature dict in the feature-bus format (keyed by video)."""
    rng = np.random.default_rng(seed)
    return {v: rng.standard_normal((num_frames, dim)).astype(np.float32) for v in videos}
