"""Temporal TCN driver — covers BOTH reference TCN stages with one script:

  * MT4MTLKD/Temporal_tenco/run.py (student TCN over Spatial_cnn features:
    --mask 75% train masking, loss 0.1*(i+v+t)+ivt, no dedup);
  * TERL/0_5fold_TCN_black/run.py (TCN over TERL features: --dedup_black
    frozen-frame removal, pos-weighted i/v/t BCE, --loss_type branches
    including 'single', --train_div partial epochs).

Usage:
  python -m computervision_codes_tpu.cli.temporal_tcn -t -e \
      --data_dir <root> --feats_version Res18 -k 1 --epochs 20 \
      [--mask] [--dedup_black] [--loss_type all|i|v|t|ivt|single]
"""

from __future__ import annotations

from functools import partial

import sys
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.feature_store import FeatureStore
from ..data.temporal import (
    DEFAULT_BUCKETS,
    TemporalSequenceDataset,
    pad_sequence_batch,
    sample_clip,
)
from ..losses import TARGET_POS_WEIGHT, TOOL_POS_WEIGHT, VERB_POS_WEIGHT
from ..models.tcn import TemporalTCN
from ..train import (
    CheckpointManager,
    build_sgd,
    create_train_state,
    make_tcn_eval_step,
    reference_warmup_exp_schedule,
)
from ..train.trainer import TrainState
from ..losses.fusion import tcn_multitask_loss
from ..utils.logging import ExperimentLogger
from . import common


def parse_flags(argv: Optional[Sequence[str]] = None):
    p = common.common_parser("Temporal TCN stage (TPU)")
    p.add_argument("--feats_version", type=str, default="Res18",
                   help="feature-bus run version to read (reference version1)")
    p.add_argument("--feats_task", type=str, default="",
                   help="task suffix of the feats artifact ('' for student)")
    p.add_argument("--num_layers_PG", type=int, default=11)
    p.add_argument("--num_layers_R", type=int, default=10)
    p.add_argument("--num_R", type=int, default=3)
    p.add_argument("--num_f_maps", type=int, default=512)
    p.add_argument("--mask", action="store_true",
                   help="75%% random train-time feature masking")
    p.add_argument("--fpn", action="store_true", default=True)
    p.add_argument("--causal", action="store_true")
    p.add_argument("--hier", action="store_true",
                   help="hierarchical pyramid (avgpool k7 s3 per refinement)")
    p.add_argument("--dedup_black", action="store_true",
                   help="drop frozen/black frames (TERL TCN_black)")
    p.add_argument("--train_div", type=float, default=1.0,
                   help="train on 1/div of the videos per epoch")
    p.add_argument("--comp_weight", type=float, default=0.1)
    p.add_argument("--weight_source", choices=["sampling", "balancing"],
                   default="sampling",
                   help="i/v/t BCE pos-weights: 'sampling' = the constant "
                        "sampling-average weights the reference actually "
                        "trains with (0_5fold_TCN_black/run.py:432-435); "
                        "'balancing' = the per-variant/per-fold "
                        "get_weight_balancing tables the reference defines "
                        "but leaves unwired (run.py:168-265)")
    flags, _ = p.parse_known_args(argv)
    return flags


def challenge_protocol(dedup_black: bool, dataset_variant: str) -> bool:
    """ignore_null protocol for the eval tables, per driver mode.

    TCN_black mode (--dedup_black) hardcodes the challenge protocol —
    the reference sets ``set_chlg_eval = True`` unconditionally
    (TERL/0_5fold_TCN_black/run.py:142) — while tenco mode derives it
    from the dataset-variant name (MT4MTLKD/Temporal_tenco/run.py:131).
    """
    return common.ignore_null_protocol(
        "tcn_black" if dedup_black else "temporal_tenco", dataset_variant)


def make_loss_type_train_step(model, loss_type: str, comp_weight: float,
                              pos_weights):
    """Train step with the TCN_black loss_type branches (run.py:330-343)."""

    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch):
        state, rng = state.next_rng()

        def loss_fn(params):
            out = state.apply_fn({"params": params}, batch["features"],
                                 train=True, apply_mask=True,
                                 rngs={"dropout": rng})
            labels = {k: batch[f"label_{k}"] for k in ("ivt", "i", "v", "t")}
            parts = tcn_multitask_loss(out, labels, comp_weight=comp_weight,
                                       pos_weights=pos_weights,
                                       frame_mask=batch.get("frame_mask"))
            if loss_type in ("i", "v", "t", "ivt"):
                total = parts[loss_type]
            elif loss_type == "single":
                total = (parts["i"] + parts["v"] + parts["t"]) / 3.0
            else:
                total = parts["total"]
            parts["selected"] = total
            return total, parts

        grads, parts = jax.grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads)
        return state, {f"loss_{k}": v for k, v in parts.items()}

    return step


def main(argv: Optional[Sequence[str]] = None) -> dict:
    flags = parse_flags(argv)
    rng_key = common.seed_everything(flags.seed)
    np_rng = np.random.default_rng(flags.seed)
    dtype = jnp.bfloat16 if flags.dtype == "bfloat16" else jnp.float32

    feats_root = flags.feats_dir or f"{flags.data_dir}/data_feats"
    store = FeatureStore(feats_root, flags.feats_version)
    from ..data.splits import resolve_split

    split = resolve_split(flags.dataset_variant, flags.kfold)
    all_videos = split.all_videos
    ds = TemporalSequenceDataset(flags.data_dir, store, flags.kfold,
                                 all_videos, task=flags.feats_task,
                                 dedup_black=flags.dedup_black)
    in_dim = ds[split.train[0]].features.shape[1]

    modelname = common.build_modelname(flags) + "_tcn"
    model_dir = f"{flags.ckpt_root}/run_{flags.version}"
    logger = ExperimentLogger(model_dir, modelname)
    ckpt = CheckpointManager(model_dir, modelname)

    model = TemporalTCN(num_layers_pg=flags.num_layers_PG,
                        num_layers_r=flags.num_layers_R,
                        num_refinements=flags.num_R,
                        num_f_maps=flags.num_f_maps,
                        use_fpn=flags.fpn, causal=flags.causal,
                        hier=flags.hier,
                        mask_rate=0.75 if flags.mask else 0.0,
                        dtype=dtype)
    sched = reference_warmup_exp_schedule(
        flags.initial_learning_rates[2], flags.power, flags.warmups[2],
        flags.decay_rate, steps_per_epoch=max(1, len(split.train)))
    tx = build_sgd(sched, flags.weight_decay)
    example = jnp.zeros((1, DEFAULT_BUCKETS[0], in_dim), jnp.float32)
    state = create_train_state(model, tx, rng_key, (example,))
    state = common.maybe_resume(flags, ckpt, state, logger)

    if flags.weight_source == "balancing":
        from ..data.class_weights import weight_balancing

        wb = weight_balancing(flags.dataset_variant, flags.kfold)
        pos_weights = {"i": np.asarray(wb["tool"], np.float32),
                       "v": np.asarray(wb["verb"], np.float32),
                       "t": np.asarray(wb["target"], np.float32)}
    else:
        pos_weights = {"i": TOOL_POS_WEIGHT, "v": VERB_POS_WEIGHT,
                       "t": TARGET_POS_WEIGHT}
    train_step = make_loss_type_train_step(model, flags.loss_type,
                                           flags.comp_weight, pos_weights)
    eval_step = make_tcn_eval_step(model)

    def eval_video(state, video):
        seq = ds[video]
        batch = pad_sequence_batch(seq)
        probs = eval_step(state, jnp.asarray(batch["features"]))
        t = int(batch["length"])
        return {k: np.asarray(v[0][:t]) for k, v in probs.items()}, seq

    def run_eval(videos, metrics):
        for video in videos:
            probs, seq = eval_video(state, video)
            for key, m in metrics.items():
                m.update(seq.labels[key], probs[key])
                m.video_end()

    metrics = common.make_metrics()
    set_chlg = challenge_protocol(flags.dedup_black, flags.dataset_variant)
    logger.run_header("temporal_tcn", modelname, flags.version, 1,
                      f"peak {flags.initial_learning_rates[2]} warmup "
                      f"{flags.warmups[2]} decay {flags.decay_rate}")
    result = {}

    if flags.train:
        from ..utils.preempt import PreemptionGuard

        guard_cm = PreemptionGuard()
        with guard_cm as guard:
            for epoch in range(flags.epochs):
                order = list(split.train)
                np_rng.shuffle(order)
                order = order[: max(1, int(len(order) / flags.train_div))]
                for video in order:
                    if guard.requested:
                        break
                    seq = sample_clip(np_rng, ds[video])
                    batch = pad_sequence_batch(seq)
                    jb = {k: jnp.asarray(v) for k, v in batch.items()
                          if k != "length"}
                    state, m = train_step(state, jb)
                if guard.requested:
                    ckpt.save(state, tag="latest")
                    logger.log("preemption signal: saved _latest, "
                               "stopping training (resume with --resume)")
                    result["preempted"] = True
                    break
                logger.scalars("train/loss",
                               {k: float(v) for k, v in m.items()}, epoch)
                if epoch % flags.val_interval == 0:
                    common.reset_metrics(metrics)
                    run_eval(split.val, metrics)
                    selector = flags.loss_type if flags.loss_type in \
                        ("i", "v", "t") else "ivt"
                    score = metrics[selector].compute_video_AP()["mAP"]
                    behaviour = ckpt.update(state, score, epoch,
                                            logger.logfile)
                    logger.log(f"epoch {epoch} val mAP[{selector}] "
                               f"{score:.5f} ckpt {behaviour}")
        result["train_epochs"] = flags.epochs

    if flags.test:
        if ckpt.exists():
            state = ckpt.restore(state)
        common.reset_metrics(metrics)
        run_eval(split.test, metrics)
        table = common.compute_map_table(metrics, flags.loss_type, set_chlg)
        common.print_final_report(logger, table, metrics)
        result["test_mAP"] = {c: table[c]["mAP"] for c in table}
        print("test mAP:", {c: round(table[c]["mAP"], 4) for c in table})

    logger.close()
    return result


if __name__ == "__main__":
    main(sys.argv[1:])
