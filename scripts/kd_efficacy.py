"""End-to-end KD-efficacy experiment on learnable synthetic data.

Drives ALL FOUR MT4MTLKD stages through the real CLI drivers and the pickle
feature bus (the contract of MT4MTLKD/Scripts/train_fold1.sh) and measures
whether the distillation machinery actually helps:

  1. 3x Q2L spatial teachers (loss_type i/v/t) — trained LONG — dump
     per-task features to the bus;
  2. 3x MS-TCT temporal teachers over those features — dump refined
     per-task predictions;
  3. the Spatial_cnn student — trained SHORT — twice from the same init:
     (a) hard labels only (rates 1 0 0), (b) full KD mix (rates 1 1 1,
     soft targets + feature MSE through the cross-task attention);
  4. a TCN over each student's dumped features.

The dataset renders labels into pixels (data/synthetic.py:
write_learnable_synthetic_dataset) and corrupts a fraction of the STORED
train labels; the long-trained teachers average the noise out, so their
soft targets de-noise the short-trained student. The assertion is
delta = mean val+test video-mAP over i/v/t (KD student - no-KD student) > 0.

Run (CPU, ~15-30 min on this 1-core host):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/kd_efficacy.py
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
    p.add_argument("--label_corrupt", type=float, default=0.25)
    p.add_argument("--noise", type=float, default=30.0)
    p.add_argument("--segment_len", type=int, default=4,
                   help="frames per constant-label segment (temporal "
                        "structure so MS-TCT refinement helps)")
    p.add_argument("--teacher_backbone", type=str, default="resnet18",
                   help="Q2L backbone for the spatial teachers (must out-"
                        "know the short-trained student for KD to help)")
    p.add_argument("--teacher_epochs", type=int, default=10)
    p.add_argument("--mstct_epochs", type=int, default=8)
    p.add_argument("--mstct_lr", type=float, default=0.005,
                   help="stage-2 peak lr (0.05 diverged the t-task MS-TCT "
                        "and 0.02 the i-task on longer videos; the "
                        "reference itself ramps MS-TCT over a 500-epoch "
                        "warmup, Scripts/train_fold1.sh:16)")
    p.add_argument("--mstct_warmup", type=int, default=3,
                   help="stage-2 warmup epochs (reference protocol warms "
                        "up 25%% of training)")
    p.add_argument("--student_epochs", type=int, default=1)
    p.add_argument("--tcn_epochs", type=int, default=12)
    p.add_argument("--tcn_lr", type=float, default=0.01,
                   help="stage-4 peak lr (0.05 collapses the tiny TCN to a "
                        "constant predictor on 8-frame synthetic videos)")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=47)
    p.add_argument("--root", type=str, default="")
    p.add_argument("--skip_assert", action="store_true")
    return p.parse_args()


def main():
    a = parse_args()
    from computervision_codes_tpu.cli import (
        spatial_cnn,
        spatial_transformer,
        temporal_mstct,
        temporal_tcn,
    )
    from computervision_codes_tpu.data.splits import resolve_split
    from computervision_codes_tpu.data.synthetic import (
        write_learnable_synthetic_dataset,
    )

    root = a.root or tempfile.mkdtemp(prefix="kd_efficacy_")
    ckpt = os.path.join(root, "ckpt")
    split = resolve_split("cholect45-crossval", 1)
    if not os.path.exists(os.path.join(root, "triplet")):
        # corrupt ONLY the train split's stored labels: val selection and
        # held-out scoring stay truthful (corrupted eval labels cap and
        # noise every measured mAP)
        write_learnable_synthetic_dataset(
            root, split.all_videos, frames_per_video=a.frames, height=a.size,
            width=a.size, seed=a.seed, label_corrupt=a.label_corrupt,
            noise=a.noise, segment_len=a.segment_len,
            corrupt_videos=split.train)
    print(f"[kd_efficacy] dataset at {root} "
          f"({len(split.all_videos)} videos x {a.frames} frames, "
          f"corrupt={a.label_corrupt})")

    common = ["--data_dir", root, "-k", "1", "--ckpt_root", ckpt,
              "--image_height", str(a.size), "--image_width", str(a.size),
              "-b", str(a.batch), "--seed", str(a.seed),
              "-l", str(a.lr), str(a.lr), str(a.lr), "-w", "1", "1", "1",
              "--augmentation_list"]  # empty list: clean eval view

    t0 = time.time()

    def done(version, task, kind):
        return os.path.exists(os.path.join(
            root, "data_feats", f"run_{version}", f"k1_{task}_{kind}.pkl"))

    def assert_finite_dump(version, task, kind):
        """Fail fast if a stage dumped non-finite artifacts — a poisoned
        bus invalidates every downstream stage (and did: see --mstct_lr)."""
        import pickle

        import numpy as np

        name = f"k1_{task}_{kind}.pkl" if task else f"k1_{kind}.pkl"
        path = os.path.join(root, "data_feats", f"run_{version}", name)
        with open(path, "rb") as f:
            d = pickle.load(f)
        vals = np.concatenate([np.asarray(v).ravel() for v in d.values()])
        assert np.isfinite(vals).all(), (
            f"{path}: {(~np.isfinite(vals)).mean():.1%} non-finite — "
            f"stage diverged; lower its lr")

    # ---- stage 1: Q2L spatial teachers --------------------------------
    for task in ("i", "v", "t"):
        if done("TEACH", task, "feats"):
            print(f"[stage1 Q2L {task}] cached dump found, skipping")
            continue
        r = spatial_transformer.main(
            ["-t", "-e", "-d", "--backbone", a.teacher_backbone,
             "--loss_type", task, "--epochs", str(a.teacher_epochs),
             "--version", "TEACH", "--val_interval", "2"] + common)
        assert_finite_dump("TEACH", task, "feats")
        print(f"[stage1 Q2L {task}] test mAP {r['test_mAP'][task]:.4f} "
              f"({time.time() - t0:.0f}s)")

    # ---- stage 2: MS-TCT temporal teachers ----------------------------
    for task in ("i", "v", "t"):
        if done("TEACHMSTCT", task, "pred"):
            print(f"[stage2 MSTCT {task}] cached dump found, skipping")
            continue
        r = temporal_mstct.main(
            ["-t", "-e", "-d", "--loss_type", task,
             "--feats_version", "TEACH", "--version", "TEACHMSTCT",
             "--epochs", str(a.mstct_epochs),
             "--window", str(min(16, a.frames)),
             "--inter_channels", "32", "48", "64", "96", "--head", "4",
             "--final_embedding_dim", "64", "--val_interval", "2"] + common
            + ["-l", str(a.mstct_lr), str(a.mstct_lr), str(a.mstct_lr),
               "-w", str(a.mstct_warmup), str(a.mstct_warmup),
               str(a.mstct_warmup)])
        assert_finite_dump("TEACHMSTCT", task, "pred")
        print(f"[stage2 MSTCT {task}] test mAP {float(r['test_mAP']):.4f} "
              f"({time.time() - t0:.0f}s)")

    # ---- stage 3: student with and without KD -------------------------
    teacher_dims = {"swin_nano_64": 256, "resnet18": 512, "resnet50": 2048}
    tdim = str(teacher_dims[a.teacher_backbone])

    def run_student(tag, rates):
        r = spatial_cnn.main(
            ["-t", "-e", "-d", "--network", "resnet18", "--loss_type", "all",
             "--rates", *rates, "--teacher_feat_version", "TEACH",
             "--teacher_pred_version", "TEACHMSTCT", "--teacher_dim", tdim,
             "--epochs", str(a.student_epochs), "--version", tag,
             "--val_interval", "1"] + common)
        assert_finite_dump(tag, None, "feats")
        print(f"[stage3 student {tag}] test mAP {r['test_mAP']} "
              f"({time.time() - t0:.0f}s)")
        return r

    res_nokd = run_student("nokd", ["1", "0", "0"])
    res_kd = run_student("kd", ["1", "1", "1"])

    # ---- stage 4: TCN over each student's features --------------------
    def run_tcn(tag):
        r = temporal_tcn.main(
            ["-t", "-e", "--feats_version", tag, "--version", tag,
             "--epochs", str(a.tcn_epochs), "--num_layers_PG", "3",
             "--num_layers_R", "3", "--num_f_maps", "16",
             "--val_interval", "2"] + common
            + ["-l", str(a.tcn_lr), str(a.tcn_lr), str(a.tcn_lr)])
        print(f"[stage4 TCN {tag}] test mAP {r['test_mAP']} "
              f"({time.time() - t0:.0f}s)")
        return r

    tcn_nokd = run_tcn("nokd")
    tcn_kd = run_tcn("kd")

    def ivt_mean(res):
        return sum(res["test_mAP"][k] for k in ("i", "v", "t")) / 3.0

    summary = {
        "student_nokd": res_nokd["test_mAP"],
        "student_kd": res_kd["test_mAP"],
        "tcn_nokd": tcn_nokd["test_mAP"],
        "tcn_kd": tcn_kd["test_mAP"],
        "delta_student_ivt_mean": ivt_mean(res_kd) - ivt_mean(res_nokd),
        "delta_tcn_triplet": (tcn_kd["test_mAP"]["ivt"]
                              - tcn_nokd["test_mAP"]["ivt"]),
        "minutes": round((time.time() - t0) / 60, 1),
    }
    print("[kd_efficacy] " + json.dumps(summary))
    if not a.skip_assert:
        assert summary["delta_student_ivt_mean"] > 0, (
            "KD student must beat the no-KD student on held-out videos: "
            f"{summary}")
    return summary


if __name__ == "__main__":
    main()
