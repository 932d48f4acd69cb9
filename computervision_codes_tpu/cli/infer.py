"""Score a surgical video file -> per-frame triplet probabilities.

The production inference entry point the reference lacks entirely (its
eval paths only dump pickles from inside train/test loops,
MT4MTLKD/Spatial_cnn/test.py:248-286). One command takes a video — an
MJPEG-in-AVI container (native plane, mmap'd random access) or a
reference-layout PNG frame directory — and a serving artifact, and writes
per-frame probabilities for all four tasks.

Usage:
  python -m computervision_codes_tpu.cli.infer \\
      --video /data/VID01.avi \\
      --servable /models/student_int8 \\
      --out preds.npz
  # or straight from a training checkpoint:
  python -m computervision_codes_tpu.cli.infer --video ... \\
      --ckpt_dir __checkpoint__/run_Res18 --modelname <name> [--quantize]

The offline path windows the video into (batch, clip_len) clips through
the AOT-compiled InferenceSession (uint8 in, normalization on device) and
trims the tail padding; `--streaming` instead drives the per-frame
StreamingSession (causal ring buffer) for latency-realistic output.

Host memory stays bounded at two decode chunks regardless of video
length (a 2 h surgery is ~180k frames ≈ 62 GB of uint8 at the serving
geometry — never materialized): frames are decoded span-by-span, with the
next span decoding on a worker thread while the device scores the current
one. Output: .npz with float32 arrays i/v/t/ivt of shape (T, C).
"""

from __future__ import annotations

import os
import sys
from typing import Optional, Sequence

import numpy as np

TASKS = ("ivt", "i", "v", "t")


class _FrameSource:
    """Random-access uint8 frames at the serving geometry.

    Both backends decode on demand so the driver can hold just the spans
    in flight instead of the whole video.
    """

    def __init__(self, video: str, size):
        self._size = size
        self._vr = None
        if video.endswith((".avi", ".mjpg")):
            from ..data import native

            if not native.video_supported():
                raise RuntimeError("container input needs the native plane "
                                   "— run native/build.sh")
            self._vr = native.VideoReader(video)
            self._n = len(self._vr)
        elif os.path.isdir(video):
            self._names = [os.path.join(video, f)
                           for f in sorted(os.listdir(video))
                           if f.endswith((".png", ".jpg"))]
            if not self._names:
                raise ValueError(f"no frames in {video}")
            self._n = len(self._names)
        else:
            raise ValueError(f"--video must be an .avi/.mjpg container or "
                             f"a frame directory, got {video!r}")

    def __len__(self) -> int:
        return self._n

    def read(self, start: int, count: int) -> np.ndarray:
        """(min(count, T-start), H, W, 3) uint8 — clamped at the tail."""
        stop = min(start + count, self._n)
        if self._vr is not None:
            return self._vr.read_u8(list(range(start, stop)), self._size)
        from PIL import Image

        from ..data.transforms import raw_resize_u8

        return np.stack([raw_resize_u8(Image.open(p), self._size)
                         for p in self._names[start:stop]])

    def close(self):
        if self._vr is not None:
            self._vr.close()


def main(argv: Optional[Sequence[str]] = None) -> dict:
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--video", type=str, required=True,
                   help=".avi/.mjpg container or a PNG/JPG frame directory")
    p.add_argument("--servable", type=str, default="",
                   help="frozen artifact from cli.export / sess.export()")
    p.add_argument("--ckpt_dir", type=str, default="")
    p.add_argument("--modelname", type=str, default="")
    p.add_argument("--network", type=str, default="resnet18")
    p.add_argument("--quantize", action="store_true")
    p.add_argument("--random_init", action="store_true",
                   help="no weights (plumbing checks only)")
    p.add_argument("--streaming", action="store_true",
                   help="per-frame causal StreamingSession instead of "
                        "offline clip batching")
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--clip_len", type=int, default=256)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=448)
    # streaming-session TCN geometry (offline sessions carry theirs in the
    # checkpoint/servable); reference flag names, temporal_tcn.py:55-58
    p.add_argument("--context", type=int, default=256)
    p.add_argument("--num_layers_PG", type=int, default=11)
    p.add_argument("--num_layers_R", type=int, default=10)
    p.add_argument("--num_R", type=int, default=3)
    p.add_argument("--num_f_maps", type=int, default=512)
    p.add_argument("--out", type=str, default="",
                   help="write .npz of per-frame probabilities here")
    flags, _ = p.parse_known_args(argv)

    src = _FrameSource(flags.video, (flags.height, flags.width))
    t = len(src)

    from .. import serving

    try:
        if flags.streaming:
            if flags.servable:
                sess = serving.StreamingSession.load_exported(flags.servable)
            else:
                kw = dict(streams=1, height=flags.height, width=flags.width,
                          network=flags.network, quantize=flags.quantize,
                          context=flags.context,
                          num_layers_pg=flags.num_layers_PG,
                          num_layers_r=flags.num_layers_R,
                          num_refinements=flags.num_R,
                          num_f_maps=flags.num_f_maps)
                if flags.ckpt_dir:
                    sess = serving.StreamingSession.from_checkpoint(
                        flags.ckpt_dir, flags.modelname, **kw)
                elif flags.random_init:
                    sess = serving.StreamingSession.create(**kw)
                else:
                    raise ValueError("need --servable, --ckpt_dir or "
                                     "--random_init")
            # push() squeezes the stream dim for single-stream sessions
            probs = _drive(src, t, span=max(flags.batch * flags.clip_len,
                                            256),
                           score=lambda chunk: _score_streaming(sess, chunk))
        else:
            if flags.servable:
                sess = serving.InferenceSession.load_exported(flags.servable)
                b, cl = sess.batch, sess.clip_len
            else:
                b, cl = flags.batch, flags.clip_len
                kw = dict(batch=b, clip_len=cl, height=flags.height,
                          width=flags.width, network=flags.network,
                          quantize=flags.quantize)
                if flags.ckpt_dir:
                    sess = serving.InferenceSession.from_checkpoint(
                        flags.ckpt_dir, flags.modelname, **kw)
                elif flags.random_init:
                    sess = serving.InferenceSession.create(**kw)
                else:
                    raise ValueError("need --servable, --ckpt_dir or "
                                     "--random_init")
            probs = _drive(src, t, span=b * cl,
                           score=lambda chunk: _score_offline(sess, b, cl,
                                                              chunk))
    finally:
        src.close()

    result = {"frames": t, "probs": probs}
    top = np.argmax(probs["ivt"], axis=1)
    print(f"scored {t} frames | modal top-1 triplet class "
          f"{int(np.bincount(top).argmax())} | mean max-prob "
          f"{float(probs['ivt'].max(axis=1).mean()):.4f}")
    if flags.out:
        np.savez(flags.out, **{k: probs[k].astype(np.float32)
                               for k in probs})
        print(f"wrote {flags.out}")
        result["out"] = flags.out
    return result


def _score_offline(sess, batch: int, clip_len: int,
                   chunk: np.ndarray) -> dict:
    """One span (<= batch*clip_len frames) -> per-frame probs, tail
    zero-padded to the compiled shape and trimmed back."""
    n, span = chunk.shape[0], batch * clip_len
    if n < span:
        chunk = np.concatenate(
            [chunk, np.zeros((span - n,) + chunk.shape[1:], np.uint8)])
    out = sess.predict(chunk.reshape(batch, clip_len, *chunk.shape[1:]))
    return {k: np.asarray(out[k]).reshape(span, -1)[:n] for k in TASKS}


def _score_streaming(sess, chunk: np.ndarray) -> dict:
    outs = [sess.push(frame) for frame in chunk]
    return {k: np.stack([o[k] for o in outs]) for k in TASKS}


def _drive(src: _FrameSource, t: int, span: int, score) -> dict:
    """Decode span i+1 on a worker thread while the device scores span i;
    at most two spans of uint8 are resident at any time."""
    from concurrent.futures import ThreadPoolExecutor

    parts = []
    with ThreadPoolExecutor(max_workers=1) as pool:
        nxt = pool.submit(src.read, 0, span)
        for start in range(0, t, span):
            chunk = nxt.result()
            if start + span < t:
                nxt = pool.submit(src.read, start + span, span)
            parts.append(score(chunk))
    return {k: np.concatenate([p[k] for p in parts]) for k in TASKS}


if __name__ == "__main__":
    main(sys.argv[1:])
