"""Spatial transformer teacher driver (MT4MTLKD stage 1: Swin/Q2L).

TPU re-design of MT4MTLKD/Spatial_transformer/run.py + test.py: train a
single-task Q2L teacher (--loss_type i|v|t) or the reverse-KD 'all' variant,
evaluate, and dump per-task features to the bus
(k{fold}_{loss_type}_feats.pkl — the artifact the MS-TCT and student stages
read).

Reference quirk NOT reproduced by default: the reference train loop breaks
after epoch 0 (run.py:480), silently ignoring --epochs; pass
--break_after_first_epoch for bit-parity with published recipes.
"""

from __future__ import annotations

import sys
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.feature_store import FeatureStore
from ..data.pipeline import CholecDataset, batch_iterator
from ..losses import TARGET_POS_WEIGHT, TOOL_POS_WEIGHT, VERB_POS_WEIGHT
from ..models.q2l import Q2L
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
    p = common.common_parser("MT4MTLKD spatial transformer teacher (TPU)")
    p.add_argument("--backbone", type=str, default="swin_L_384_22k")
    p.add_argument("--rates", type=float, nargs="+", default=[1, 0, 0.1])
    p.add_argument("--teacher_feat_version", type=str, default="Res18")
    p.add_argument("--teacher_pred_version", type=str, default="Res18TCN")
    p.add_argument("--break_after_first_epoch", action="store_true",
                   help="reproduce the reference's epoch-0 break quirk")
    p.add_argument("--quant_eval", action="store_true",
                   help="int8-MXU GEMMs in the Swin fused kernels for the "
                        "eval/dump passes (PTQ — training stays bf16/f32)")
    p.add_argument("--quant_min_dim", type=int, default=768,
                   help="smallest stage dim quantized by --quant_eval")
    p.add_argument("--fused_train", action="store_true",
                   help="train forward through the fused Pallas Swin "
                        "kernels (reference-autodiff backward — same "
                        "gradients; ops/swin_train). On-chip A/B round 4: "
                        "+3.3%% over save-nothing remat but LOSES under "
                        "--remat with the default dots policy — prefer "
                        "plain --remat")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize Swin blocks (jax.checkpoint) — "
                        "needed to train SwinL-384 at useful batch sizes "
                        "on one chip")
    p.add_argument("--remat_policy", type=str, default="dots",
                   choices=["dots", "none"],
                   help="remat policy: 'dots' keeps GEMM outputs resident "
                        "(measured 61.7 vs 56.3 fps, round-4 A/B); 'none' "
                        "recomputes everything")
    p.add_argument("--dp_devices", type=int, default=0,
                   help="data-parallel devices (batch sharded over the "
                        "mesh data axis; 0/1 = single device)")
    p.add_argument("--device_augment", action="store_true",
                   help="run train-time augmentation + normalization on "
                        "device (data/device_augment.py): the host only "
                        "decodes+resizes and ships uint8")
    p.add_argument("--tp_devices", type=int, default=0,
                   help="tensor-parallel devices: Megatron-style GSPMD "
                        "param placement over the mesh model axis "
                        "(parallel/tp.py) — composes with --dp_devices")
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

    modelname = common.build_modelname(flags) + f"_{flags.loss_type}"
    model_dir = f"{flags.ckpt_root}/run_{flags.version}"
    logger = ExperimentLogger(model_dir, modelname)
    ckpt = CheckpointManager(model_dir, modelname)

    # Pallas kernels (fused eval/train, int8 quant_eval) have no GSPMD
    # partitioning rule — under tensor parallelism the sharded leaves are
    # exactly the ones those kernels consume, so force the XLA path
    tp_active = flags.tp_devices > 1
    if tp_active and (flags.fused_train or flags.quant_eval):
        print("[tp] --tp_devices forces the XLA path: ignoring "
              "--fused_train/--quant_eval (Pallas kernels cannot be "
              "partitioned over the model axis)")
    fused_eval = False if tp_active else None
    model = Q2L(backbone=flags.backbone, loss_type=flags.loss_type,
                teacher_dim=flags.teacher_dim, dtype=dtype,
                fused_eval=fused_eval,
                remat=flags.remat,
                remat_policy="" if flags.remat_policy == "none" else
                flags.remat_policy,
                fused_train=flags.fused_train and not tp_active)
    # eval/dump may run the int8 serving path; the TRAIN model/params are
    # shared (quant_eval only changes fused-kernel execution, not the tree)
    eval_model = Q2L(backbone=flags.backbone, loss_type=flags.loss_type,
                     teacher_dim=flags.teacher_dim, dtype=dtype,
                     quant_eval=True, quant_min_dim=flags.quant_min_dim) \
        if flags.quant_eval and not tp_active else model
    steps_per_epoch = max(1, len(dataset.frame_index(split.train)) // flags.batch)
    sched = reference_warmup_exp_schedule(
        flags.initial_learning_rates[2], flags.power, flags.warmups[2],
        flags.decay_rate, steps_per_epoch)
    tx = build_sgd(sched, flags.weight_decay)

    example = jnp.zeros((1, flags.image_height, flags.image_width, 3),
                        jnp.float32)
    tfeat = jnp.zeros((1, flags.teacher_dim), jnp.float32)
    init_args = (example, tfeat, tfeat, tfeat) \
        if flags.loss_type == "all" else (example,)
    state = create_train_state(model, tx, rng, init_args)
    state = common.maybe_warm_start(flags, state, flags.backbone, logger)
    state = common.maybe_resume(flags, ckpt, state, logger)

    batch_sh = None
    if flags.dp_devices > 1 or flags.tp_devices > 1:
        from ..parallel.mesh import batch_sharding, make_mesh
        from ..parallel.tp import shard_state_tp

        mesh = make_mesh(n_data=max(1, flags.dp_devices),
                         n_model=max(1, flags.tp_devices))
        # TP = pure GSPMD placement (params + optimizer trace split over
        # the model axis, everything unmatched replicated); with
        # tp_devices <= 1 this degrades to plain replication, i.e. DP.
        state = shard_state_tp(state, mesh)
        batch_sh = batch_sharding(mesh)
        if flags.batch % max(1, flags.dp_devices):
            raise ValueError("--batch must be divisible by --dp_devices")

    pos_weights = {"i": TOOL_POS_WEIGHT, "v": VERB_POS_WEIGHT,
                   "t": TARGET_POS_WEIGHT}
    train_step = make_spatial_train_step(model, flags.loss_type, flags.rates,
                                         flags.temp, pos_weights)
    eval_step = make_spatial_eval_step(eval_model)
    # mid-training validation drives best-by-val checkpoint selection with
    # the FLOAT model; the int8 twin serves only the final --test/--dump
    # passes (ADVICE r3 — PTQ noise must not pick the checkpoint)
    val_step = make_spatial_eval_step(model) if flags.quant_eval \
        else eval_step

    def run_batch(images):
        return eval_step(state, jnp.asarray(images))

    def run_batch_val(images):
        return val_step(state, jnp.asarray(images))

    metrics = common.make_metrics()
    set_chlg = common.ignore_null_protocol("spatial_transformer",
                                           flags.dataset_variant)
    logger.run_header("spatial_transformer", modelname, flags.version,
                      flags.batch, f"backbone {flags.backbone}")
    result = {}

    aug_fn = None
    if flags.device_augment:
        from ..data.device_augment import make_device_augment

        aug_fn = make_device_augment(tuple(flags.augmentation_list))
        aug_base = jax.random.PRNGKey(flags.seed ^ 0x5EED)

    if flags.train:
        from ..utils.preempt import install_preemption_guard

        guard = install_preemption_guard()
        step_no = 0
        for epoch in range(flags.epochs):
            for batch in batch_iterator(dataset, split.train, flags.batch,
                                        train=True, seed=flags.seed + epoch,
                                        teacher_dim=flags.teacher_dim,
                                        pad_last=True):
                if guard.requested:
                    break
                jb = {k: jnp.asarray(v) for k, v in batch.items()
                      if k != "valid"}
                if aug_fn is not None:
                    jb["image"] = aug_fn(
                        jax.random.fold_in(aug_base, step_no), jb["image"])
                    step_no += 1
                if batch_sh is not None:
                    jb = {k: jax.device_put(v, batch_sh)
                          for k, v in jb.items()}
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
                common.reset_metrics(metrics)
                common.evaluate_videos(run_batch_val, dataset, split.val,
                                       flags.batch, metrics)
                sel = flags.loss_type if flags.loss_type in ("i", "v", "t") \
                    else "ivt"
                score = metrics[sel].compute_video_AP()["mAP"]
                behaviour = ckpt.update(state, score, epoch, logger.logfile)
                logger.log(f"epoch {epoch} val mAP[{sel}] {score:.5f} "
                           f"ckpt {behaviour}")
            if flags.break_after_first_epoch:
                break  # reference run.py:480 quirk
        result["train_epochs"] = flags.epochs

    if flags.test:
        if ckpt.exists():
            state = ckpt.restore(state)
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
        store = FeatureStore(feats_root, flags.version or "Q2L")
        dm = common.make_metrics()
        feats = common.evaluate_videos(run_batch, dataset, split.all_videos,
                                       flags.batch, dm, collect_features=True)
        task = flags.loss_type if flags.loss_type in ("i", "v", "t") else ""
        path = store.save(flags.kfold, "feats", feats, task=task)
        logger.log(f"Dumped features to {path}")
        result["dump_path"] = path

    logger.close()
    return result


if __name__ == "__main__":
    main(sys.argv[1:])
