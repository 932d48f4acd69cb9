"""TERL warm-up -> full-loss efficacy experiment on learnable synthetic data.

Companion to scripts/kd_efficacy.py for the TERL pipeline (VERDICT round 1,
next-round item 3): drives the real `cli.terl_learnt` driver twice from the
same seed on the same synthetic dataset and measures whether the tail-aware
contrastive machinery (KCL + prototype + tail-CAM losses, enabled after the
`--w_epoch` BCE warm-up, reference TERL/6_baseline_learnT/run.py:238-320)
actually helps held-out video mAP:

  (a) baseline : --w_con 0 --w_proto 0 --w_tail 0  (plain BCE all epochs)
  (b) full     : --w_con/--w_proto/--w_tail 1      (warm-up then full loss)

The dataset renders labels into pixels with heavy Gaussian noise
(data/synthetic.py:render_triplet_frame) and the driver trains with two
independently-augmented views per frame (the reference's two-crop protocol,
dataloader.py:233-266); the k-positive contrastive loss pulls same-triplet
features together across the noise, a consistency signal the BCE baseline
does not get. All default-vocab triplets are tail classes (HEAD_CLASSES =
{17, 60, 19}), so the tail-anchor path is exercised for real.

The assertion is mean-over-seeds delta(test mAP[ivt]) > 0.

Run (CPU, ~10-20 min on this 1-core host):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/terl_efficacy.py
Recorded results live in RESULTS.md.
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--noise", type=float, default=55.0)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--w_epoch", type=int, default=2)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-5,
                   help="the TERL ASL is x1000-scaled, so reference-scale "
                        "lrs apply (runT.sh trains at 1e-5); 0.05 diverges")
    p.add_argument("--seeds", type=int, nargs="+", default=[47, 48])
    p.add_argument("--root", type=str, default="")
    p.add_argument("--skip_assert", action="store_true")
    return p.parse_args()


def main():
    a = parse_args()
    from computervision_codes_tpu.cli import terl_learnt
    from computervision_codes_tpu.data.splits import resolve_split
    from computervision_codes_tpu.data.synthetic import (
        write_learnable_synthetic_dataset,
    )

    root = a.root or tempfile.mkdtemp(prefix="terl_efficacy_")
    split = resolve_split("cholect45-crossval", 1)
    if not os.path.exists(os.path.join(root, "triplet")):
        write_learnable_synthetic_dataset(
            root, split.all_videos, frames_per_video=a.frames, height=a.size,
            width=a.size, seed=11, noise=a.noise)
    print(f"[terl_efficacy] dataset at {root} "
          f"({len(split.all_videos)} videos x {a.frames} frames, "
          f"noise={a.noise})")
    t0 = time.time()

    def run(tag, seed, w_con, w_proto, w_tail):
        r = terl_learnt.main(
            ["-t", "-e", "--backbone", "swin_nano_64", "--img_size",
             str(a.size), "--moco_k", "256", "--kcl_k", "3", "--mlp",
             "--max_anchors_per_image", "2",
             "--epochs", str(a.epochs), "--w_epoch", str(a.w_epoch),
             "--w_con", str(w_con), "--w_proto", str(w_proto),
             "--w_tail", str(w_tail),
             "--data_dir", root, "-k", "1",
             "--ckpt_root", os.path.join(root, "ckpt"),
             "--version", f"{tag}{seed}", "-b", str(a.batch),
             "--seed", str(seed), "-l", str(a.lr), str(a.lr), str(a.lr),
             "-w", "1", "1", "1", "--val_interval", "2",
             "--augmentation_list", "brightness", "contrast", "jitter"])
        m = r["test_mAP"]["ivt"]
        print(f"[terl {tag} seed={seed}] test mAP[ivt] {m:.4f} "
              f"({time.time() - t0:.0f}s)")
        return m

    deltas, rows = [], []
    for seed in a.seeds:
        base = run("bce", seed, 0, 0, 0)
        full = run("full", seed, 1, 1, 1)
        deltas.append(full - base)
        rows.append({"seed": seed, "bce": base, "full": full})

    summary = {
        "runs": rows,
        "delta_ivt_mean": sum(deltas) / len(deltas),
        "minutes": round((time.time() - t0) / 60, 1),
    }
    print("[terl_efficacy] " + json.dumps(summary))
    if not a.skip_assert:
        assert summary["delta_ivt_mean"] > 0, (
            "TERL full loss must beat the BCE baseline on held-out videos: "
            f"{summary}")
    return summary


if __name__ == "__main__":
    main()
