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
Output: .npz with float32 arrays i/v/t/ivt of shape (T, C).
"""

from __future__ import annotations

import os
import sys
from typing import Optional, Sequence

import numpy as np


def _load_frames_u8(flags) -> np.ndarray:
    """(T, H, W, 3) uint8 at the serving geometry."""
    h, w = flags.height, flags.width
    if flags.video.endswith((".avi", ".mjpg")):
        from ..data import native

        if not native.video_supported():
            raise RuntimeError("container input needs the native plane — "
                               "run native/build.sh")
        with native.VideoReader(flags.video) as vr:
            return vr.read_u8(list(range(len(vr))), (h, w))
    if os.path.isdir(flags.video):
        from PIL import Image

        from ..data.transforms import raw_resize_u8

        names = sorted(f for f in os.listdir(flags.video)
                       if f.endswith((".png", ".jpg")))
        if not names:
            raise ValueError(f"no frames in {flags.video}")
        return np.stack([
            raw_resize_u8(Image.open(os.path.join(flags.video, f)), (h, w))
            for f in names])
    raise ValueError(f"--video must be an .avi/.mjpg container or a frame "
                     f"directory, got {flags.video!r}")


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

    frames = _load_frames_u8(flags)
    t = frames.shape[0]

    from .. import serving

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
        outs = [sess.push(frames[i]) for i in range(t)]
        probs = {k: np.stack([o[k] for o in outs]) for k in
                 ("ivt", "i", "v", "t")}
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
        span = b * cl
        padded = int(np.ceil(t / span)) * span
        clips = np.zeros((padded,) + frames.shape[1:], np.uint8)
        clips[:t] = frames
        clips = clips.reshape(-1, b, cl, *frames.shape[1:])
        chunks = [sess.predict(c) for c in clips]
        probs = {k: np.concatenate(
            [np.asarray(c[k]).reshape(span, -1) for c in chunks])[:t]
            for k in ("ivt", "i", "v", "t")}

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


if __name__ == "__main__":
    main(sys.argv[1:])
