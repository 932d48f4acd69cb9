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
    container: bool = False,
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
        if write_images and container:
            # MJPEG-in-AVI layout: <root>/data/VIDxx.avi, frame k = label
            # row k (the native-plane ingest path, data/native.VideoReader)
            os.makedirs(os.path.join(root, "data"), exist_ok=True)
            frames = np.stack([synthetic_frame(vid_rng, height, width)
                               for _ in frame_ids])
            write_mjpeg_avi(img_dir + ".avi", frames)
        elif write_images:
            os.makedirs(img_dir, exist_ok=True)
        for f, fid in enumerate(frame_ids):
            if write_images and not container:
                img = Image.fromarray(synthetic_frame(vid_rng, height, width))
                img.save(os.path.join(img_dir, "{}.png".format(str(int(fid)).zfill(6))))
        for task, subdir in (("triplet", "triplet"), ("tool", "instrument"),
                             ("verb", "verb"), ("target", "target")):
            rows = np.concatenate([frame_ids[:, None], labels[task]], axis=1)
            np.savetxt(os.path.join(root, subdir, f"{video}.txt"), rows,
                       fmt="%d", delimiter=",")
    return root


def render_triplet_frame(tool: np.ndarray, verb: np.ndarray,
                         target: np.ndarray, height: int, width: int,
                         rng: np.random.Generator,
                         noise: float = 20.0,
                         confusers: int = 0,
                         confuser_intensity: float = 140.0) -> np.ndarray:
    """Render component labels into pixels (for KD-efficacy experiments).

    The frame is split into three horizontal bands — tools (6 slots), verbs
    (10 slots), targets (15 slots); an active class lights its slot. With
    Gaussian pixel noise on top the mapping pixels -> labels is learnable
    by a small CNN but not trivially saturated, which is what lets a
    longer-trained teacher genuinely out-know a short-trained student.

    ``confusers`` > 0 additionally half-lights that many RANDOM slots per
    frame at ``confuser_intensity`` — structured nuisance a CNN cannot
    average away (unlike i.i.d. noise), so few-shot classes can overfit
    spurious slot patterns; the lever for tail-class experiments.
    """
    img = np.full((height, width, 3), 32.0)
    bands = ((tool, 0), (verb, 1), (target, 2))
    bh = height // 3

    def slot(bi, n, k, value):
        sw = width / n
        x0, x1 = int(k * sw), max(int((k + 1) * sw), int(k * sw) + 1)
        img[bi * bh:(bi + 1) * bh, x0:x1] = value

    for _ in range(confusers):
        bi = int(rng.integers(0, 3))
        n = (6, 10, 15)[bi]
        slot(bi, n, int(rng.integers(0, n)), confuser_intensity)
    for vec, bi in bands:
        for k in np.nonzero(vec)[0]:
            slot(bi, len(vec), k, 220.0)
    img += rng.standard_normal(img.shape) * noise
    return np.clip(img, 0, 255).astype(np.uint8)


def write_learnable_synthetic_dataset(
    root: str,
    videos: Sequence[str],
    frames_per_video: int = 8,
    height: int = 32,
    width: int = 56,
    seed: int = 0,
    vocab: Sequence[int] = (4, 18, 40, 63, 87, 95),
    label_corrupt: float = 0.0,
    noise: float = 20.0,
    segment_len: int = 0,
    corrupt_videos: Optional[Sequence[str]] = None,
    vocab_probs: Optional[Sequence[float]] = None,
    confusers: int = 0,
) -> str:
    """CholecT45-layout dataset whose PIXELS encode the labels.

    Unlike ``write_synthetic_dataset`` (random pixels, good for plumbing
    smoke tests), frames here render their active triplets'
    tool/verb/target slots, restricted to a small triplet ``vocab`` so tiny
    models can learn the task. ``label_corrupt`` swaps each active triplet
    in the STORED labels with another vocab member with that probability
    (pixels stay truthful) — label noise that a long-trained teacher
    averages out, letting its soft targets de-noise a KD student.
    ``segment_len`` > 0 keeps the TRUE triplet set constant over segments
    of that many frames (surgical phases): temporal models can then
    majority-vote the per-frame pixel/label noise within a segment, so the
    MS-TCT refinement stage genuinely improves on the per-frame teacher.
    ``corrupt_videos`` restricts label corruption to that subset (pass the
    TRAIN split): held-out evaluation then scores against TRUTHFUL labels —
    corrupting test labels too would cap and noise every measured mAP.
    ``vocab_probs`` weights each vocab member's inclusion probability
    (normalized): small weights make RARE (tail) classes for contrastive
    tail-learning experiments. ``confusers`` per-frame half-lit random
    slots (see render_triplet_frame).
    """
    from PIL import Image

    bank = load_bank()
    vocab = np.asarray(vocab)
    rng = np.random.default_rng(seed)
    for task_dir in ("triplet", "instrument", "verb", "target"):
        os.makedirs(os.path.join(root, task_dir), exist_ok=True)

    def multi_hot(trips):
        t = np.zeros(NUM_TRIPLET, np.int64)
        i = np.zeros(NUM_TOOL, np.int64)
        v = np.zeros(NUM_VERB, np.int64)
        g = np.zeros(NUM_TARGET, np.int64)
        for tr in trips:
            t[tr] = 1
            i[bank[tr, 1]] = 1
            v[bank[tr, 2]] = 1
            g[bank[tr, 3]] = 1
        return t, i, v, g

    for vi, video in enumerate(videos):
        vr = np.random.default_rng(seed + 1000 + vi)
        # corruption draws come from a SEPARATE stream so pixels/true labels
        # are bit-identical across corruption settings (same seed)
        cr = np.random.default_rng(seed + 90000 + vi)
        corrupt_here = label_corrupt if (
            corrupt_videos is None or video in set(corrupt_videos)) else 0.0
        frame_ids = np.arange(frames_per_video)
        img_dir = os.path.join(root, "data", video)
        os.makedirs(img_dir, exist_ok=True)
        rows = {k: [] for k in ("triplet", "tool", "verb", "target")}
        true = []
        probs = None
        if vocab_probs is not None:
            probs = np.asarray(vocab_probs, np.float64)
            probs = probs / probs.sum()
        for fi, fid in enumerate(frame_ids):
            if segment_len <= 0 or fi % segment_len == 0:
                k = int(vr.integers(0, 3))
                true = list(vr.choice(vocab, size=k, replace=False,
                                      p=probs))
            _, ti, tv, tg = multi_hot(true)
            img = render_triplet_frame(ti, tv, tg, height, width, vr, noise,
                                       confusers=confusers)
            Image.fromarray(img).save(
                os.path.join(img_dir, f"{int(fid):06d}.png"))
            stored = [int(cr.choice(vocab)) if cr.random() < corrupt_here
                      else tr for tr in true]
            st, si, sv, sg = multi_hot(stored)
            for key, vec in (("triplet", st), ("tool", si), ("verb", sv),
                             ("target", sg)):
                rows[key].append(np.r_[fid, vec])
        for task, subdir in (("triplet", "triplet"), ("tool", "instrument"),
                             ("verb", "verb"), ("target", "target")):
            np.savetxt(os.path.join(root, subdir, f"{video}.txt"),
                       np.stack(rows[task]), fmt="%d", delimiter=",")
    return root


def synthetic_feature_dict(videos: Sequence[str], num_frames: int, dim: int,
                           seed: int = 0) -> dict:
    """Random cached-feature dict in the feature-bus format (keyed by video)."""
    rng = np.random.default_rng(seed)
    return {v: rng.standard_normal((num_frames, dim)).astype(np.float32) for v in videos}


def write_mjpeg_avi(path: str, frames: np.ndarray, fps: int = 25,
                    quality: int = 90) -> str:
    """Mux (N, H, W, 3) uint8 frames into an MJPEG-in-AVI file.

    Pure-python RIFF muxer (standard hdrl/movi/idx1 layout) over
    PIL-encoded baseline JPEGs — generates the video-container inputs the
    native plane's dp_video_* ingest consumes (native/dataplane.cpp),
    which replaces the reference's PNG-per-frame dataset layout
    (MT4MTLKD/readme.md:30-89) as the production feed.
    """
    import io
    import struct

    from PIL import Image

    n, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
    jpegs = []
    for f in frames:
        buf = io.BytesIO()
        Image.fromarray(f).save(buf, format="JPEG", quality=quality)
        jpegs.append(buf.getvalue())

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(listtype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", listtype + body)

    max_bytes = max(len(j) for j in jpegs)
    avih = struct.pack("<14I", 1_000_000 // fps, max_bytes * fps, 0,
                       0x10,  # AVIF_HASINDEX
                       n, 0, 1, max_bytes, w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIiI", 0, 0, 0, 0,
                                            1, fps, 0, n, max_bytes, -1, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_body = b"movi"
    idx = b""
    for j in jpegs:
        off = len(movi_body)  # offset of the 00dc fourcc from 'movi' start
        movi_body += chunk(b"00dc", j)
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(j))
    movi = chunk(b"LIST", movi_body)
    riff_body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    with open(path, "wb") as fh:
        fh.write(b"RIFF" + len(riff_body).to_bytes(4, "little") + riff_body)
    return path
