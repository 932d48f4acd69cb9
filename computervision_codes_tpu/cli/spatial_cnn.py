"""Spatial CNN student driver (MT4MTLKD stage 3).

TPU re-design of MT4MTLKD/Spatial_cnn/run.py + test.py: train the ResNet
student (optionally with multi-teacher KD when --loss_type all), evaluate
per-video mAP, keep latest/best checkpoints, and dump per-video features to
the cached-feature bus (test.py:270-284 pickle protocol).

Usage (mirrors the reference flag surface):
  python -m computervision_codes_tpu.cli.spatial_cnn -t -e \
      --data_dir <cholect_root> --dataset_variant cholect45-crossval -k 1 \
      --loss_type ivt --epochs 2 -b 8
Dump features for all videos (train+test+val order) after training:
  ... -d --version Res18
"""

from __future__ import annotations

import sys
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.feature_store import FeatureStore
from ..data.pipeline import CholecDataset, batch_iterator
from ..losses import TARGET_POS_WEIGHT, TOOL_POS_WEIGHT, VERB_POS_WEIGHT
from ..models.spatial_cnn import SpatialCNN
from ..train import (
    CheckpointManager,
    build_sgd,
    create_train_state,
    make_spatial_eval_step,
    make_spatial_train_step,
    reference_warmup_exp_schedule,
)
from ..utils.logging import ExperimentLogger
from . import common


def parse_flags(argv: Optional[Sequence[str]] = None):
    p = common.common_parser("MT4MTLKD spatial CNN student (TPU)")
    p.add_argument("--rates", type=float, nargs="+", default=[1, 0, 0.1])
    p.add_argument("--teacher_feat_version", type=str, default="Q2L")
    p.add_argument("--teacher_pred_version", type=str, default="Q2LMSTCT")
    p.add_argument("--qat", action="store_true",
                   help="quantization-aware fine-tune: train through the "
                        "int8 weight fake-quant the serving path applies "
                        "(models/qat.py); eval/dump run the fake-quant "
                        "weights")
    p.add_argument("--dp_devices", type=int, default=0,
                   help="data-parallel training over this many devices "
                        "(0 = single device; gradients all-reduce over the "
                        "mesh, BN moments are cross-replica)")
    p.add_argument("--device_augment", action="store_true",
                   help="run train-time augmentation + normalization on "
                        "device (data/device_augment.py): the host only "
                        "decodes+resizes and ships uint8 (4x less "
                        "host->device traffic, no PIL in the hot loop)")
    flags, _ = p.parse_known_args(argv)
    return flags


def main(argv: Optional[Sequence[str]] = None) -> dict:
    flags = parse_flags(argv)
    rng = common.seed_everything(flags.seed)
    dtype = jnp.bfloat16 if flags.dtype == "bfloat16" else jnp.float32

    dataset = CholecDataset(flags.data_dir, flags.dataset_variant, flags.kfold,
                            augmentation_list=flags.augmentation_list,
                            image_size=(flags.image_height, flags.image_width),
                            device_augment=flags.device_augment)
    split = dataset.split
    feats_root = flags.feats_dir or f"{flags.data_dir}/data_feats"
    if flags.loss_type == "all" and flags.train:
        dataset.attach_teachers(
            FeatureStore(feats_root, flags.teacher_feat_version),
            FeatureStore(feats_root, flags.teacher_pred_version),
            flags.kfold, split.train)

    modelname = common.build_modelname(flags)
    model_dir = f"{flags.ckpt_root}/run_{flags.version}"
    logger = ExperimentLogger(model_dir, modelname)
    ckpt = CheckpointManager(model_dir, modelname)

    model = SpatialCNN(network=flags.network, loss_type=flags.loss_type,
                       teacher_dim=flags.teacher_dim, dtype=dtype)
    steps_per_epoch = max(
        1, len(dataset.frame_index(split.train)) // flags.batch)
    sched = reference_warmup_exp_schedule(
        flags.initial_learning_rates[2], flags.power, flags.warmups[2],
        flags.decay_rate, steps_per_epoch)
    tx = build_sgd(sched, flags.weight_decay)

    example_img = jnp.zeros((1, flags.image_height, flags.image_width, 3),
                            jnp.float32)
    tfeat = jnp.zeros((1, flags.teacher_dim), jnp.float32)
    init_args = (example_img, tfeat, tfeat, tfeat) \
        if flags.loss_type == "all" else (example_img,)
    state = create_train_state(model, tx, rng, init_args)
    state = common.maybe_warm_start(flags, state, flags.network, logger)
    if flags.pretrain_dir:
        state = CheckpointManager(flags.pretrain_dir, modelname).restore(state)
    state = common.maybe_resume(flags, ckpt, state, logger)

    pos_weights = {"i": TOOL_POS_WEIGHT, "v": VERB_POS_WEIGHT,
                   "t": TARGET_POS_WEIGHT}
    train_step = make_spatial_train_step(
        model, flags.loss_type, flags.rates, flags.temp, pos_weights,
        sam_rho=flags.sam_rho if flags.optimizer == "sam" else 0.0,
        qat=flags.qat)
    eval_step = make_spatial_eval_step(model, qat=flags.qat)

    def run_batch(images):
        probs, feats = eval_step(state, jnp.asarray(images))
        return probs, feats

    metrics = common.make_metrics()
    set_chlg = common.ignore_null_protocol("spatial_cnn",
                                           flags.dataset_variant)
    logger.run_header("spatial_cnn", modelname, flags.version, flags.batch,
                      f"peak {flags.initial_learning_rates} warmup "
                      f"{flags.warmups} decay {flags.decay_rate}")
    result = {}

    batch_sh = None
    if flags.dp_devices > 1:
        from ..parallel.mesh import batch_sharding, make_mesh, replicate

        mesh = make_mesh(n_data=flags.dp_devices)
        state = replicate(state, mesh)
        batch_sh = batch_sharding(mesh)
        if flags.batch % flags.dp_devices:
            raise ValueError("--batch must be divisible by --dp_devices")

    aug_fn = None
    if flags.device_augment:
        from ..data.device_augment import make_device_augment

        aug_fn = make_device_augment(tuple(flags.augmentation_list))
        aug_base = jax.random.PRNGKey(flags.seed ^ 0x5EED)

    if flags.train:
        from ..data.prefetch import prefetch_to_device
        from ..utils.preempt import install_preemption_guard

        guard = install_preemption_guard()
        for epoch in range(flags.epochs):
            logger.log(f"Training | epoch {epoch}", end=" | ")
            stream = batch_iterator(dataset, split.train, flags.batch,
                                    train=True, seed=flags.seed + epoch,
                                    teacher_dim=flags.teacher_dim,
                                    drop_last=False, pad_last=True)
            stream = ({k: v for k, v in b.items() if k != "valid"}
                      for b in stream)
            step_no = 0
            for jb in prefetch_to_device(stream, sharding=batch_sh):
                if guard.requested:
                    break
                if aug_fn is not None:
                    jb = dict(jb)
                    jb["image"] = aug_fn(
                        jax.random.fold_in(
                            jax.random.fold_in(aug_base, epoch), step_no),
                        jb["image"])
                    step_no += 1
                state, m = train_step(state, jb)
            if guard.requested:
                ckpt.save(state, tag="latest")
                logger.log("preemption signal: saved _latest, stopping "
                           "training (resume with --resume)")
                result["preempted"] = True
                break
            logger.scalars("train/loss",
                           {k: float(v) for k, v in m.items()}, epoch)
            if epoch % flags.val_interval == 0:
                start = time.time()
                common.reset_metrics(metrics)
                logger.log(f"Evaluating @ epoch: {epoch}")
                common.evaluate_videos(run_batch, dataset, split.val,
                                       flags.batch, metrics)
                # checkpoint-selector metric: the trained task for
                # single-task runs, disentangled ivt otherwise
                # (reference run.py:425-432)
                selector = flags.loss_type if flags.loss_type in \
                    ("i", "v", "t") else "ivt"
                score = metrics[selector].compute_video_AP()["mAP"]
                behaviour = ckpt.update(state, score, epoch, logger.logfile)
                table = common.compute_map_table(metrics, flags.loss_type,
                                                 set_chlg)
                logger.scalars("val/mAP",
                               {f"mAP_{c}": table[c]["mAP"] for c in table},
                               epoch)
                logger.log(f"\tval | eta {time.time() - start:.2f}s | "
                           f"mAP ivt [{table['ivt']['mAP']:.5f}] | "
                           f"ckpt {behaviour}")
        result["train_epochs"] = flags.epochs

    if flags.test:
        if ckpt.exists():
            state = ckpt.restore(state)
        logger.log(f"Test weight: {ckpt._path('')}")
        common.reset_metrics(metrics)
        common.evaluate_videos(run_batch, dataset, split.test, flags.batch,
                               metrics)
        table = common.compute_map_table(metrics, flags.loss_type, set_chlg)
        common.print_final_report(logger, table, metrics)
        result["test_mAP"] = {c: table[c]["mAP"] for c in table}
        print("test mAP:", {c: round(table[c]["mAP"], 4) for c in table})

    if flags.dump:
        if ckpt.exists():
            state = ckpt.restore(state)
        store = FeatureStore(feats_root, flags.version or "Res18")
        dump_metrics = common.make_metrics()
        feats = common.evaluate_videos(run_batch, dataset, split.all_videos,
                                       flags.batch, dump_metrics,
                                       collect_features=True)
        task = "" if flags.loss_type in ("all", "ivt") else flags.loss_type
        path = store.save(flags.kfold, "feats", feats, task=task)
        logger.log(f"Dumped features for {len(feats)} videos to {path}")
        result["dump_path"] = path

    logger.close()
    return result


if __name__ == "__main__":
    main(sys.argv[1:])
