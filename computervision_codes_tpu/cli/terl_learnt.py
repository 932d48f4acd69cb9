"""TERL learnT driver (tail-enhanced contrastive spatial stage).

TPU re-design of TERL/6_baseline_learnT/run.py + test.py: Swin + CAM heads
+ MoCo queue/prototypes with tail-aware losses; evaluation uses the
component-max i/v/t from ivt logits (test.py:246-252); dump writes
k{fold}_feats.pkl (pooled backbone features) and k{fold}_pred.pkl (sigmoid
ivt probabilities) for the TCN_black temporal stage.

Canonical recipes (TERL runT.sh / runB.sh): SwinT 224 / moco_dim 768 or
SwinB 384 / moco_dim 1024, moco-k 16384, w_epoch 1, epochs 20, seed
20000912, --mlp, --train_div 2 or 4.
"""

from __future__ import annotations

import sys
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.feature_store import FeatureStore
from ..data.pipeline import CholecDataset, batch_iterator
from ..models.moco import TERLModel, select_tail_anchors
from ..models.swin import swin_feature_dim
from ..train import (CheckpointManager, build_sgd, freeze_swin_early,
                     reference_warmup_exp_schedule)
from ..train.terl import (
    create_terl_state,
    make_terl_eval_step,
    make_terl_train_step,
)
from ..losses.components import component_max_logits
from ..utils.logging import ExperimentLogger
from . import common

# reference head-class lists (TERL/6_baseline_learnT/run.py:224-227)
HEAD_CLASSES = {"ivt": (17, 60, 19), "i": (0, 2), "v": (1, 2), "t": (0, 8)}
TASK_NUM = {"ivt": 100, "i": 6, "v": 10, "t": 15}


def tail_head_masks(task: str):
    num = TASK_NUM[task]
    tail = np.ones(num, np.float32)
    tail[list(HEAD_CLASSES[task])] = 0.0
    return tail, 1.0 - tail


def parse_flags(argv: Optional[Sequence[str]] = None):
    p = common.common_parser("TERL learnT tail-contrastive stage (TPU)")
    p.add_argument("--backbone", type=str, default="swin_T_224_1k")
    p.add_argument("--img_size", type=int, default=224)
    p.add_argument("--moco_dim", type=int, default=768)
    p.add_argument("--moco_k", type=int, default=16384)
    p.add_argument("--moco_m", type=float, default=0.999)
    p.add_argument("--moco_t", type=float, default=0.07)
    p.add_argument("--mlp", action="store_true")
    p.add_argument("--fused_train", action="store_true",
                   help="train forward through the fused Pallas Swin "
                        "kernels (reference-autodiff backward)")
    p.add_argument("--fix_backbone", action="store_true",
                   help="freeze the Swin patch embed + stages 0-1 "
                        "(reference models/backbone.py:203-206)")
    p.add_argument("--ht", action="store_true",
                   help="separate head/tail CAM heads")
    p.add_argument("--w_epoch", type=int, default=5)
    p.add_argument("--drop_classes", type=int, nargs="+", default=[],
                   help="triplet class ids removed from the train head "
                        "(eval restores them as zeros, run.py:424-437)")
    p.add_argument("--tail_num", type=int, default=84,
                   help="number of rarest triplet classes treated as tail "
                        "(from ins_num.txt)")
    p.add_argument("--tail_classes_ivt", type=int, nargs="+", default=[],
                   help="explicit tail class list (overrides --tail_num)")
    p.add_argument("--eval_train_tail", action="store_true",
                   help="also evaluate the last 9 train videos "
                        "(reference build_test_train_dataset)")
    p.add_argument("--w_con", type=float, default=1.0)
    p.add_argument("--w_proto", type=float, default=1.0)
    p.add_argument("--w_tail", type=float, default=1.0)
    p.add_argument("--kcl_k", type=int, default=7)
    p.add_argument("--train_div", type=float, default=1.0)
    p.add_argument("--max_anchors_per_image", type=int, default=4)
    p.add_argument("--eval_tag", type=str, default="",
                   help="checkpoint tag for --test/--dump restore: '' = "
                        "best-by-val (reference protocol), 'latest' = "
                        "final epoch (efficacy endpoint comparisons)")
    p.add_argument("--cam_dump", type=str, default="",
                   help="directory: restore the checkpoint and write "
                        "per-task CAM overlay PNGs for test-split frames "
                        "(reference cam.py:200-278 checkpoint->overlay tool)")
    p.add_argument("--device_augment", action="store_true",
                   help="generate BOTH contrastive views on device from "
                        "one uint8 upload (data/device_augment.py): the "
                        "host only decodes+resizes — halves host-side "
                        "augmentation work AND transfer vs two f32 views")
    p.add_argument("--cam_frames", type=int, default=8,
                   help="max frames to render with --cam_dump")
    flags, _ = p.parse_known_args(argv)
    return flags


def main(argv: Optional[Sequence[str]] = None) -> dict:
    flags = parse_flags(argv)
    rng = common.seed_everything(flags.seed)
    dtype = jnp.bfloat16 if flags.dtype == "bfloat16" else jnp.float32
    flags.moco_dim = swin_feature_dim(flags.backbone)  # see train/terl.py

    dataset = CholecDataset(flags.data_dir, flags.dataset_variant, flags.kfold,
                            augmentation_list=flags.augmentation_list,
                            image_size=(flags.img_size, flags.img_size),
                            device_augment=flags.device_augment)
    split = dataset.split
    aug2_fn = None
    if flags.device_augment:
        import jax as _jax

        from ..data.device_augment import make_device_augment

        aug2_fn = make_device_augment(tuple(flags.augmentation_list),
                                      two_view=True)
        aug_base = _jax.random.PRNGKey(flags.seed ^ 0x2C0F)
    feats_root = flags.feats_dir or f"{flags.data_dir}/data_feats"

    modelname = common.build_modelname(flags) + "_learnT"
    model_dir = f"{flags.ckpt_root}/run_{flags.version}"
    logger = ExperimentLogger(model_dir, modelname)
    ckpt = CheckpointManager(model_dir, modelname)

    ht_masks = {t: tail_head_masks(t)[::-1] for t in TASK_NUM} \
        if flags.ht else None  # (head_mask, tail_mask) per task
    tail_ivt_mask, _ = tail_head_masks("ivt")

    # class dropping (reference run.py:208-211,510): the ivt head covers
    # only the surviving classes; class_map sends remapped -> original ids
    valid_classes = [c for c in range(100) if c not in set(flags.drop_classes)]
    n_ivt = len(valid_classes)
    class_map = np.asarray(valid_classes, np.int64)
    tail_ivt_mask = tail_ivt_mask[class_map]
    if ht_masks is not None and n_ivt != 100:
        # the ivt CAM heads are n_ivt-wide under --drop_classes
        hm, tm = ht_masks["ivt"]
        ht_masks = dict(ht_masks, ivt=(hm[class_map], tm[class_map]))

    model = TERLModel(backbone=flags.backbone, moco_dim=flags.moco_dim,
                      mlp=flags.mlp, ht=flags.ht, num_triplet=n_ivt,
                      fused_train=getattr(flags, "fused_train", False),
                      dtype=dtype)
    steps_per_epoch = max(1, len(dataset.frame_index(split.train)) //
                          flags.batch)
    sched = reference_warmup_exp_schedule(
        flags.initial_learning_rates[2], flags.power, flags.warmups[2],
        flags.decay_rate, steps_per_epoch)
    tx = build_sgd(sched, flags.weight_decay)
    if flags.fix_backbone:
        tx = freeze_swin_early(tx)
    example = jnp.zeros((1, flags.img_size, flags.img_size, 3), jnp.float32)
    state = create_terl_state(model, tx, rng, example,
                              queue_size=flags.moco_k, ht_masks=ht_masks)
    if getattr(flags, "imagenet_pretrain", ""):
        # ImageNet Swin into the query encoder (the reference's regime:
        # runT.sh always starts from pretrained backbones), then re-copy
        # to the key encoder so MoCo's EMA starts from identical twins
        state = common.maybe_warm_start(flags, state, flags.backbone,
                                        logger, submodule="encoder/backbone")
        state = state.replace(key_params=jax.tree.map(
            lambda x: jnp.array(x, copy=True), state.params))
    if flags.pretrain_dir:
        # warm-start from another TERL run's checkpoint (same model
        # config) — the reference's regime always starts from pretrained
        # backbones (runT.sh loads ImageNet Swin); this is the offline
        # equivalent for experiments
        state = CheckpointManager(flags.pretrain_dir, modelname).restore(
            state)
        logger.log(f"Warm-started from {flags.pretrain_dir}")
    state = common.maybe_resume(flags, ckpt, state, logger)

    max_anchors = flags.batch * flags.max_anchors_per_image
    train_step = make_terl_train_step(
        model, w_con=flags.w_con, w_proto=flags.w_proto, w_tail=flags.w_tail,
        w_epoch=flags.w_epoch, moco_m=flags.moco_m, moco_t=flags.moco_t,
        kcl_k=flags.kcl_k, use_mlp=flags.mlp, ht_masks=ht_masks,
        class_map=class_map if flags.drop_classes else None,
        sam_rho=flags.sam_rho if flags.optimizer == "sam" else 0.0)
    eval_step = make_terl_eval_step(model, ht_masks=ht_masks)

    def restore_full(probs_ivt):
        """Expand remapped ivt probs back to 100 classes (run.py:424-437)."""
        if n_ivt == 100:
            return probs_ivt
        full = np.zeros((probs_ivt.shape[0], 100), np.float32)
        full[:, class_map] = np.asarray(probs_ivt)
        return full

    def run_batch(images):
        probs, feats = eval_step(state, jnp.asarray(images))
        ivt_full = restore_full(np.asarray(probs["ivt"]))
        # eval protocol: component scores are the max over the triplet
        # probabilities (test.py:246-252)
        comp = component_max_logits(jnp.asarray(ivt_full))
        probs = {"ivt": ivt_full, **comp}
        return probs, feats

    metrics = common.make_metrics()
    set_chlg = common.ignore_null_protocol("terl_learnt",
                                           flags.dataset_variant)
    logger.run_header("terl_learnt", modelname, flags.version, flags.batch,
                      f"backbone {flags.backbone} mocoK {flags.moco_k}")
    result = {}

    if flags.train:
        from ..utils.preempt import install_preemption_guard

        guard = install_preemption_guard()
        for epoch in range(flags.epochs):
            n_batches = 0
            max_batches = steps_per_epoch / flags.train_div
            for batch in batch_iterator(dataset, split.train, flags.batch,
                                        train=True, seed=flags.seed + epoch,
                                        pad_last=True, two_views=True):
                if n_batches > max_batches or guard.requested:
                    break  # --train_div partial epoch (run.py:238-239)
                lab_ivt = batch["label_ivt"][:, class_map]  # remapped space
                tail_labels = lab_ivt * tail_ivt_mask[None, :]
                s, c, v = select_tail_anchors(tail_labels, max_anchors)
                if aug2_fn is not None:
                    img1, img2 = aug2_fn(
                        _jax.random.fold_in(
                            _jax.random.fold_in(aug_base, epoch), n_batches),
                        jnp.asarray(batch["image"]))
                else:
                    img1 = jnp.asarray(batch["image"])
                    img2 = jnp.asarray(batch["image2"])
                jb = {
                    "image1": img1,
                    "image2": img2,
                    "anchor_sample": jnp.asarray(s),
                    "anchor_class": jnp.asarray(c),
                    "anchor_valid": jnp.asarray(v),
                    "label_ivt": jnp.asarray(lab_ivt.astype(np.float32)),
                }
                for k in ("i", "v", "t"):
                    jb[f"label_{k}"] = jnp.asarray(
                        batch[f"label_{k}"].astype(np.float32))
                state, m = train_step(state, jb, jnp.asarray(epoch))
                n_batches += 1
            if guard.requested:
                ckpt.save(state, tag="latest")
                logger.log("preemption signal: saved _latest, stopping "
                           "training (resume with --resume)")
                result["preempted"] = True
                break
            logger.scalars("train/loss",
                           {k: float(v) for k, v in m.items()}, epoch)
            if epoch == flags.w_epoch - 1:
                ckpt.save(state, tag=f"w{flags.w_epoch}")  # warmup snapshot
            if epoch % flags.val_interval == 0:
                common.reset_metrics(metrics)
                common.evaluate_videos(run_batch, dataset, split.val,
                                       flags.batch, metrics)
                score = metrics["ivt"].compute_video_AP()["mAP"]
                behaviour = ckpt.update(state, score, epoch, logger.logfile)
                logger.log(f"epoch {epoch} val mAP[ivt] {score:.5f} "
                           f"ckpt {behaviour}")
        result["train_epochs"] = flags.epochs

    if flags.test:
        if ckpt.exists(flags.eval_tag):
            state = ckpt.restore(state, tag=flags.eval_tag)
        common.reset_metrics(metrics)
        common.evaluate_videos(run_batch, dataset, split.test, flags.batch,
                               metrics)
        table = common.compute_map_table(metrics, "all", set_chlg)
        common.print_final_report(logger, table, metrics)
        result["test_mAP"] = {c: table[c]["mAP"] for c in table}
        print("test mAP:", {c: round(table[c]["mAP"], 4) for c in table})
        if flags.eval_train_tail:
            # third eval pass: last 9 train videos (reference
            # build_test_train_dataset, dataloader.py:200-211)
            tt = common.make_metrics()
            common.evaluate_videos(run_batch, dataset, split.train[-9:],
                                   flags.batch, tt)
            score = tt["ivt"].compute_video_AP()["mAP"]
            logger.log(f"test-train (last 9 train videos) mAP[ivt] {score:.5f}")
            result["test_train_mAP"] = score

    if flags.dump:
        if ckpt.exists(flags.eval_tag):
            state = ckpt.restore(state, tag=flags.eval_tag)
        store = FeatureStore(feats_root, flags.version or "TERL")
        dm = common.make_metrics()
        preds_out = {}

        def run_batch_collect(images):
            probs, feats = eval_step(state, jnp.asarray(images))
            ivt_full = restore_full(np.asarray(probs["ivt"]))
            comp = component_max_logits(jnp.asarray(ivt_full))
            return {"ivt": ivt_full, **comp}, feats

        feats = {}
        for video in split.all_videos:
            chunks, pchunks = [], []
            from ..data.pipeline import video_eval_batches

            for b in video_eval_batches(dataset, video, flags.batch):
                probs, f = run_batch_collect(b["image"])
                valid = b["valid"]
                chunks.append(np.asarray(f)[valid])
                pchunks.append(np.asarray(probs["ivt"])[valid])
            feats[video] = np.concatenate(chunks, 0)
            preds_out[video] = np.concatenate(pchunks, 0)
        fpath = store.save(flags.kfold, "feats", feats)
        ppath = store.save(flags.kfold, "pred", preds_out)
        logger.log(f"Dumped {fpath} and {ppath}")
        result["dump_paths"] = (fpath, ppath)

    if flags.cam_dump:
        # checkpoint -> CAM overlay images, end-to-end (reference
        # cam.py:200-278 draw_CAM: JET heatmap of the class's activation
        # map blended over the frame; classes = ground-truth positives,
        # falling back to the top-1 prediction when a frame has none)
        import os

        from ..utils.cam import denormalize_frame, draw_cam

        if ckpt.exists():
            state = ckpt.restore(state)
        os.makedirs(flags.cam_dump, exist_ok=True)

        @jax.jit
        def cam_step(state, images):
            enc_out = state.apply_fn({"params": state.params}, images,
                                     train=False, ht_masks=ht_masks,
                                     method=type(model).encode)
            probs = {k: jax.nn.sigmoid(v)
                     for k, v in enc_out["logits"].items()}
            return enc_out["cams"], probs

        paths, remaining = [], flags.cam_frames
        from ..data.pipeline import video_eval_batches

        for video in split.test:
            if remaining <= 0:
                break
            row = 0  # absolute frame index within the video
            for b in video_eval_batches(dataset, video, flags.batch):
                cams, probs = cam_step(state, jnp.asarray(b["image"]))
                cams = {k: np.asarray(v, np.float32)
                        for k, v in cams.items()}
                n_valid = int(b["valid"].sum())
                for i in range(n_valid):
                    if remaining <= 0:
                        break
                    base = denormalize_frame(b["image"][i])
                    for task in ("ivt", "i", "v", "t"):
                        lab = b["label_ivt"][i, class_map] \
                            if task == "ivt" else b[f"label_{task}"][i]
                        cls = np.flatnonzero(lab > 0.5)
                        if cls.size == 0:  # reference cam.py:263-266
                            cls = [int(np.argmax(
                                np.asarray(probs[task][i])))]
                        for c in cls[:3]:
                            p = os.path.join(
                                flags.cam_dump,
                                f"{video}_{row + i:06d}_{task}{int(c)}.png")
                            paths.append(draw_cam(
                                base, cams[task][i, :, :, int(c)], p))
                    remaining -= 1
                row += n_valid
                if remaining <= 0:
                    break
        logger.log(f"CAM dump: {len(paths)} overlays in {flags.cam_dump}")
        result["cam_paths"] = paths

    logger.close()
    return result


if __name__ == "__main__":
    main(sys.argv[1:])
