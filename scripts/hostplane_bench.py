"""Host data plane benchmark: native decode vs PIL, threads sweep, and the
decode -> device feed rate the 17k-fps serving claim needs.

Measures at the reference geometry (854x480 source -> 256x448 model input,
CholecT45 frames; MT4MTLKD/Spatial_cnn/run.py:367-381 is the DataLoader
pipeline this replaces):
  * PIL (eval_transform) single-thread img/s — PNG and JPEG;
  * native float path (decode+resize+normalize) single-thread img/s;
  * native uint8 path (device-side normalization) single-thread img/s;
  * native threads=N sweep (on a 1-core host this shows contention-free
    correctness and the per-image cost; on a TPU-VM host it scales);
  * cores-to-saturate projection for the e2e chip rate;
  * optional decode -> jnp.asarray device feed timing (--device).

Run: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/hostplane_bench.py
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

CHIP_FPS = 17000.0  # e2e int8 student rate one chip sustains (BENCH.md)


def make_frames(root, n, kind="png", h=480, w=854, seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    # surgical-video-like content: smooth background + structured shapes
    base = rng.integers(0, 256, (h // 8, w // 8, 3)).astype(np.uint8)
    paths = []
    for i in range(n):
        arr = np.asarray(Image.fromarray(base).resize((w, h), Image.BILINEAR))
        arr = (arr.astype(np.int16) + rng.integers(-20, 20, arr.shape)
               ).clip(0, 255).astype(np.uint8)
        p = os.path.join(root, f"f{i}.{kind}")
        Image.fromarray(arr).save(p, quality=90) if kind == "jpg" else \
            Image.fromarray(arr).save(p)
        paths.append(p)
    return paths


def bench(fn, n, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return n / best, best / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--device", action="store_true",
                    help="include decode->jnp device transfer timing")
    args = ap.parse_args()

    from PIL import Image

    from computervision_codes_tpu.data import native
    from computervision_codes_tpu.data.transforms import eval_transform

    assert native.available(), "run native/build.sh first"
    size = (256, 448)
    rows = []

    for kind in ("png", "jpg"):
        root = tempfile.mkdtemp(prefix=f"hostplane_{kind}_")
        paths = make_frames(root, args.n, kind)

        fps, ms = bench(lambda: [eval_transform(Image.open(p), size)
                                 for p in paths], args.n)
        rows.append({"metric": f"PIL decode+resize+normalize ({kind})",
                     "img_per_s": round(fps, 1), "ms_per_img": round(ms, 2)})

        fps, ms = bench(lambda: native.decode_batch(paths, size,
                                                    n_threads=1), args.n)
        rows.append({"metric": f"native float path 1 thread ({kind})",
                     "img_per_s": round(fps, 1), "ms_per_img": round(ms, 2)})

        fps, ms = bench(lambda: native.decode_batch_u8(paths, size,
                                                       n_threads=1), args.n)
        rows.append({"metric": f"native uint8 path 1 thread ({kind})",
                     "img_per_s": round(fps, 1), "ms_per_img": round(ms, 2)})

        for t in (2, 4, 8):
            fps, ms = bench(lambda: native.decode_batch_u8(
                paths, size, n_threads=t), args.n)
            rows.append({"metric": f"native uint8 {t} threads ({kind})",
                         "img_per_s": round(fps, 1),
                         "ms_per_img": round(ms, 2)})

    # video-container ingest (round 4): MJPEG-in-AVI through the mmap'd
    # demuxer — the production feed path; PNG framestores measured
    # ~595 cores/chip and per-frame JPEG ~159 (docs/BENCH.md)
    if native.video_supported():
        from computervision_codes_tpu.data.synthetic import write_mjpeg_avi

        root = tempfile.mkdtemp(prefix="hostplane_avi_")
        frames = np.stack([
            np.asarray(Image.open(p)) for p in make_frames(root, args.n,
                                                           "jpg")])
        avi = write_mjpeg_avi(os.path.join(root, "v.avi"), frames, fps=25)
        idx = np.arange(args.n, dtype=np.int32)
        with native.VideoReader(avi) as vr:
            for t in (1, 2, 4, 8):
                fps, ms = bench(lambda: vr.read_u8(idx, size, n_threads=t),
                                args.n)
                rows.append({
                    "metric": f"native MJPEG-AVI uint8 {t} thread(s)",
                    "img_per_s": round(fps, 1), "ms_per_img": round(ms, 2)})

    for r in rows:
        print(json.dumps(r), flush=True)

    # projection: cores needed to keep one chip fed
    u8 = next(r for r in rows
              if r["metric"] == "native uint8 path 1 thread (png)")
    cores = CHIP_FPS / u8["img_per_s"]
    print(json.dumps({
        "metric": "projection: cores to saturate one chip (png, uint8 path)",
        "chip_fps": CHIP_FPS, "img_per_s_per_core": u8["img_per_s"],
        "cores_needed": round(cores, 1),
    }), flush=True)
    avi_row = next((r for r in rows
                    if r["metric"] == "native MJPEG-AVI uint8 1 thread(s)"),
                   None)
    if avi_row:
        print(json.dumps({
            "metric": "projection: cores to saturate one chip (MJPEG-AVI, "
                      "uint8 path)",
            "chip_fps": CHIP_FPS,
            "img_per_s_per_core": avi_row["img_per_s"],
            "cores_needed": round(CHIP_FPS / avi_row["img_per_s"], 1),
        }), flush=True)

    if args.device:
        import jax
        import jax.numpy as jnp

        root = tempfile.mkdtemp(prefix="hostplane_feed_")
        paths = make_frames(root, args.n, "png")

        def feed():
            arr = native.decode_batch_u8(paths, size, n_threads=1)
            jax.block_until_ready(jnp.asarray(arr))

        fps, ms = bench(feed, args.n)
        print(json.dumps({
            "metric": "decode->device feed (uint8, 1 thread)",
            "img_per_s": round(fps, 1), "ms_per_img": round(ms, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
