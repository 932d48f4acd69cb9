"""TERL warm-up -> full-loss efficacy experiment: TAIL-class gains.

Companion to scripts/kd_efficacy.py for the TERL pipeline (VERDICT round 1,
next-round item 3). TERL's value proposition is TAIL classes — KCL pulls a
rare class's few anchors toward its queue/prototype cluster, regularizing
features that plain classification overfits. The synthetic dataset makes
that measurable:

  * 6-triplet vocab, 3 COMMON (~31% of frames each) + 3 RARE (~3% each,
    roughly 7 train frames per rare class);
  * per-frame half-lit CONFUSER slots (structured nuisance a CNN cannot
    average out — few-shot classes overfit spurious slot patterns);
  * both arms run the real `cli.terl_learnt` driver with `--mlp` from the
    same seed: (a) w_con=w_proto=w_tail=0 (pure ASL classification),
    (b) the full tail-contrastive loss after `--w_epoch` warm-up.

The metric is the mean test AP of the RARE classes, computed from each
run's dumped `k1_pred.pkl` against the truthful held-out labels.

What this harness asserts: END-TO-END STABILITY — every arm trains with
finite losses through the warm-up -> full-loss transition (queue,
prototypes, EMA, anchor selection all live) and produces a valid dump.
It does NOT assert a rare-AP win: measured across seeds and difficulty
settings, the full loss does not beat plain classification when training
FROM SCRATCH on this synthetic task (recorded in RESULTS.md) — the
x1000-scaled proto/con terms dominate the loss budget (loss_proto ~15x
loss_cls), a regime the reference never runs (it always fine-tunes
ImageNet-pretrained Swins, where classification is already easy and the
contrastive terms refine an existing embedding). Verifying the positive
tail-gain claim needs pretrained weights + the real tail distribution —
blocked offline. Pass --assert_gain to enforce delta > 0 anyway.

This harness already caught two real framework bugs (recorded in
RESULTS.md): the ASL focal weight backpropping (reference runs it under
no_grad; saturated sigmoids then NaN the gradient) and torch-eps feature
normalization exploding on near-zero CAM features.

Run (CPU, ~15-25 min on this 1-core host):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/terl_efficacy.py
Recorded results live in RESULTS.md.
"""

import argparse
import json
import os
import pickle
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

VOCAB = (4, 18, 40, 63, 87, 95)
RARE = (63, 87, 95)


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--noise", type=float, default=40.0)
    p.add_argument("--confusers", type=int, default=3)
    p.add_argument("--rare_weight", type=float, default=0.1,
                   help="vocab inclusion weight of each rare class "
                        "(common classes weigh 1.0)")
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--pretrain_epochs", type=int, default=0,
                   help="> 0: first train a cls-only model this long, "
                        "then warm-start BOTH arms from its checkpoint — "
                        "the "
                        "reference's pretrained-backbone regime (runT.sh "
                        "loads ImageNet Swin), which is where the "
                        "contrastive terms are designed to operate")
    p.add_argument("--w_epoch", type=int, default=2)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--lr", type=float, default=1e-5,
                   help="the TERL ASL is x1000-scaled, so reference-scale "
                        "lrs apply (runT.sh trains at 1e-5); 0.05 diverges")
    p.add_argument("--seeds", type=int, nargs="+", default=[47, 48])
    p.add_argument("--root", type=str, default="")
    p.add_argument("--skip_assert", action="store_true")
    p.add_argument("--assert_gain", action="store_true",
                   help="additionally require delta(rare AP) > 0 (see "
                        "module docstring for why this is NOT the default)")
    p.add_argument("--eval_latest", action="store_true",
                   help="evaluate each arm's LATEST checkpoint instead of "
                        "best-by-val: the reference's best-by-val protocol "
                        "collapses every arm to the warm-start checkpoint "
                        "whenever contrastive training never improves "
                        "validation (observed in both 10-seed runs), so "
                        "this compares actual trained endpoints")
    p.add_argument("--ablate_scales", action="store_true",
                   help="per seed, also run loss-SCALE ablation arms: "
                        "'norm' divides the x1000-scaled ASL proto/tail "
                        "terms back to unit scale (w_proto=w_tail=0.001, "
                        "reference aslloss.py:114 carries the x1000 "
                        "inside the loss) and 'con' keeps only the KCL "
                        "contrastive term — isolating WHICH term moves "
                        "rare AP")
    p.add_argument("--out", type=str, default="",
                   help="append the JSON summary line to this file")
    return p.parse_args()


def mean_ci(xs, conf=0.95):
    """Mean and half-width of the t-distribution CI over seeds."""
    xs = np.asarray(xs, np.float64)
    n = len(xs)
    m = float(xs.mean())
    if n < 2:
        return m, float("nan")
    se = float(xs.std(ddof=1)) / np.sqrt(n)
    try:
        from scipy import stats

        crit = float(stats.t.ppf(0.5 + conf / 2, n - 1))
    except ImportError:  # normal approximation
        crit = 1.96
    return m, crit * se


def rare_test_ap(root, split, tag, seed):
    """Mean AP of the RARE classes over the test split, from the dump."""
    from computervision_codes_tpu.data.feature_store import (
        FeatureStore,
        video_key,
    )
    from computervision_codes_tpu.data.labels import load_video_labels
    from computervision_codes_tpu.metrics import Recognition

    store = FeatureStore(os.path.join(root, "data_feats"), f"{tag}{seed}")
    preds = store.load(1, "pred")
    rec = Recognition(num_class=100)
    for v in split.test:
        lab = load_video_labels(root, v)
        rec.update(lab.triplet, np.asarray(preds[video_key(v)]))
        rec.video_end()
    ap = rec.compute_video_AP()["AP"]
    return float(np.nanmean([ap[c] for c in RARE]))


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
        probs = [1.0 if c not in RARE else a.rare_weight for c in VOCAB]
        write_learnable_synthetic_dataset(
            root, split.all_videos, frames_per_video=a.frames, height=a.size,
            width=a.size, seed=11, noise=a.noise, vocab=VOCAB,
            vocab_probs=probs, confusers=a.confusers)
    # how rare are the rare classes in train?
    from computervision_codes_tpu.data.labels import load_video_labels

    counts = np.zeros(100)
    for v in split.train:
        counts += load_video_labels(root, v).triplet.sum(axis=0)
    print(f"[terl_efficacy] dataset at {root}; train frames per class: "
          f"common {[int(counts[c]) for c in VOCAB if c not in RARE]} "
          f"rare {[int(counts[c]) for c in RARE]}")
    t0 = time.time()

    def run(tag, seed, w_con, w_proto=None, w_tail=None, epochs=None,
            pretrain_dir=None):
        w_proto = w_con if w_proto is None else w_proto
        w_tail = w_con if w_tail is None else w_tail
        argv = [
            "-t", "-e", "-d", "--backbone", "swin_nano_64", "--img_size",
            str(a.size), "--moco_k", "256", "--kcl_k", "3", "--mlp",
            "--max_anchors_per_image", "2",
            "--epochs", str(epochs or a.epochs),
            "--w_epoch", str(a.w_epoch),
            "--w_con", str(w_con), "--w_proto", str(w_proto),
            "--w_tail", str(w_tail),
            "--data_dir", root, "-k", "1",
            "--ckpt_root", os.path.join(root, "ckpt"),
            "--version", f"{tag}{seed}", "-b", str(a.batch),
            "--seed", str(seed), "-l", str(a.lr), str(a.lr), str(a.lr),
            "-w", "1", "1", "1", "--val_interval", "2",
            "--augmentation_list", "brightness", "contrast", "jitter"]
        if a.eval_latest:
            argv += ["--eval_tag", "latest"]
        if pretrain_dir:
            argv += ["--pretrain_dir", pretrain_dir]
        terl_learnt.main(argv)
        ap = rare_test_ap(root, split, tag, seed)
        print(f"[terl {tag} seed={seed}] rare-class test AP {ap:.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)
        return ap

    # arm -> (w_con, w_proto, w_tail); 'norm' undoes the reference's x1000
    # ASL scale on the proto/tail terms (it lives INSIDE the loss,
    # losses/asl.py:58 = reference aslloss.py:114), 'con' isolates KCL
    arms = {"full": (1.0, 1.0, 1.0)}
    if a.ablate_scales:
        arms["norm"] = (1.0, 0.001, 0.001)
        arms["con"] = (1.0, 0.0, 0.0)

    deltas = {arm: [] for arm in arms}
    rows = []
    for seed in a.seeds:
        pre_dir = None
        row = {"seed": seed}
        if a.pretrain_epochs > 0:
            row["pre_rare_ap"] = run("pre", seed, 0,
                                     epochs=a.pretrain_epochs)
            pre_dir = os.path.join(root, "ckpt", f"run_pre{seed}")
        base = run("bce", seed, 0, pretrain_dir=pre_dir)
        row["bce_rare_ap"] = base
        for arm, (wc, wp, wt) in arms.items():
            ap = run(arm, seed, wc, wp, wt, pretrain_dir=pre_dir)
            row[f"{arm}_rare_ap"] = ap
            deltas[arm].append(ap - base)
        rows.append(row)
        part = {arm: mean_ci(d) for arm, d in deltas.items()}
        print(f"[terl_efficacy] after seed {seed}: " + json.dumps(
            {arm: {"mean": round(m, 4), "ci95": round(c, 4)}
             for arm, (m, c) in part.items()}), flush=True)

    summary = {
        "runs": rows,
        "delta_rare_ap_mean": sum(deltas["full"]) / len(deltas["full"]),
        "arms": {},
        "n_seeds": len(a.seeds),
        "minutes": round((time.time() - t0) / 60, 1),
    }
    for arm, d in deltas.items():
        m, c = mean_ci(d)
        summary["arms"][arm] = {
            "delta_rare_ap_mean": round(m, 5),
            "ci95_half_width": round(c, 5) if np.isfinite(c) else None,
            "deltas": [round(x, 5) for x in d],
        }
    print("[terl_efficacy] " + json.dumps(summary))
    if a.out:
        with open(a.out, "a") as f:
            print(json.dumps(summary), file=f)
    if not a.skip_assert:
        for r in rows:  # stability contract: valid finite APs from dumps
            assert np.isfinite(r["bce_rare_ap"]), r
            assert np.isfinite(r["full_rare_ap"]), r
    if a.assert_gain:
        assert summary["delta_rare_ap_mean"] > 0, (
            "TERL full loss must beat the classification baseline on "
            f"held-out rare-class AP: {summary}")
    return summary


if __name__ == "__main__":
    main()
