"""MS-TCT temporal teacher driver (MT4MTLKD stage 2).

TPU re-design of MT4MTLKD/Temporal_mstct/run.py + test.py: train the
single-task MS-TCT teacher on random 256-frame windows of cached Q2L
features (dataloader.py:224-245), evaluate full videos as one sequence, and
dump BOTH per-frame features and sigmoid predictions
(k{fold}_{loss_type}_{feats,pred}.pkl — test.py:340-367), the artifacts the
KD student consumes.

TPU notes: train windows share a static length so they batch cleanly
(B, 256, D) — the reference uses B=31 windows (run.py:306). Full-video eval
goes through the Pallas blockwise attention (ops/attention.py), removing the
reference's O(T²) materialization.
"""

from __future__ import annotations

from functools import partial

import sys
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.feature_store import FeatureStore
from ..data.temporal import (
    TemporalSequenceDataset,
    pad_sequence_batch,
    sample_window,
)
from ..losses import (
    TARGET_POS_WEIGHT,
    TOOL_POS_WEIGHT,
    VERB_POS_WEIGHT,
    bce_with_logits,
)
from ..models.mstct import MSTCT
from ..train import (
    CheckpointManager,
    build_sgd,
    create_train_state,
    reference_warmup_exp_schedule,
)
from ..train.state import TrainState
from ..utils.logging import ExperimentLogger
from . import common

TASK_INFO = {"i": (6, TOOL_POS_WEIGHT), "v": (10, VERB_POS_WEIGHT),
             "t": (15, TARGET_POS_WEIGHT), "ivt": (100, None)}


def parse_flags(argv: Optional[Sequence[str]] = None):
    p = common.common_parser("MS-TCT temporal teacher (TPU)")
    p.add_argument("--feats_version", type=str, default="Q2L")
    p.add_argument("--window", type=int, default=256)
    p.add_argument("--inter_channels", type=int, nargs="+",
                   default=[256, 384, 576, 864])
    p.add_argument("--num_block", type=int, default=2)
    p.add_argument("--head", type=int, default=8)
    p.add_argument("--mlp_ratio", type=float, default=8.0)
    p.add_argument("--final_embedding_dim", type=int, default=512)
    p.add_argument("--log_train_map", action="store_true",
                   help="log per-epoch train mAP (the reference logs train "
                        "mAP every batch, run.py:159-196)")
    p.add_argument("--seq_devices", type=int, default=0,
                   help="context-parallel full-video eval: shard T over this "
                        "many devices (0 = single device)")
    p.add_argument("--seq_attn", type=str, default="gather",
                   choices=("gather", "ring"),
                   help="attention schedule under --seq_devices: 'gather' "
                        "lets GSPMD all-gather K/V per chip; 'ring' keeps "
                        "K/V sharded and rotates them over ICI (exact, for "
                        "T where gathered K/V exceed chip memory)")
    flags, _ = p.parse_known_args(argv)
    if flags.loss_type == "all":
        flags.loss_type = "ivt"
    return flags


def make_mstct_train_step(model, task: str, pos_weight):
    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch):
        state, rng = state.next_rng()

        def loss_fn(params):
            out = state.apply_fn({"params": params}, batch["features"],
                                 train=True, rngs={"dropout": rng})
            loss = bce_with_logits(out["logits"], batch["labels"],
                                   pos_weight=pos_weight)
            return loss, {"loss": loss}

        grads, metrics = jax.grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads=grads), metrics

    return step


def main(argv: Optional[Sequence[str]] = None) -> dict:
    flags = parse_flags(argv)
    rng_key = common.seed_everything(flags.seed)
    np_rng = np.random.default_rng(flags.seed)
    dtype = jnp.bfloat16 if flags.dtype == "bfloat16" else jnp.float32
    task = flags.loss_type
    num_classes, pos_weight = TASK_INFO[task]

    feats_root = flags.feats_dir or f"{flags.data_dir}/data_feats"
    store = FeatureStore(feats_root, flags.feats_version)
    from ..data.splits import resolve_split

    split = resolve_split(flags.dataset_variant, flags.kfold)
    feats_task = task if task in ("i", "v", "t") else ""
    ds = TemporalSequenceDataset(flags.data_dir, store, flags.kfold,
                                 split.all_videos, task=feats_task)
    in_dim = ds[split.train[0]].features.shape[1]

    modelname = common.build_modelname(flags) + f"_mstct_{task}"
    model_dir = f"{flags.ckpt_root}/run_{flags.version}"
    logger = ExperimentLogger(model_dir, modelname)
    ckpt = CheckpointManager(model_dir, modelname)

    model = MSTCT(embed_dims=tuple(flags.inter_channels),
                  num_blocks=flags.num_block, num_heads=flags.head,
                  mlp_ratio=flags.mlp_ratio,
                  final_embedding_dim=flags.final_embedding_dim,
                  num_classes=num_classes, dtype=dtype)
    steps_per_epoch = max(
        1, -(-len(split.train) // flags.batch))  # ceil: window groups/epoch
    sched = reference_warmup_exp_schedule(
        flags.initial_learning_rates[2], flags.power, flags.warmups[2],
        flags.decay_rate, steps_per_epoch=steps_per_epoch)
    tx = build_sgd(sched, flags.weight_decay)
    example = jnp.zeros((1, flags.window, in_dim), jnp.float32)
    state = create_train_state(model, tx, rng_key, (example,))
    state = common.maybe_resume(flags, ckpt, state, logger)

    train_step = make_mstct_train_step(model, task, pos_weight)

    @jax.jit
    def eval_fn(state, feats):
        out = state.apply_fn({"params": state.params}, feats, train=False)
        return jax.nn.sigmoid(out["logits"]), out["feature"]

    seq_mesh = None
    if flags.seq_devices > 1:
        from ..parallel.mesh import make_mesh

        seq_mesh = make_mesh(n_data=1, n_seq=flags.seq_devices)

    def eval_video(video):
        seq = ds[video]
        batch = pad_sequence_batch(seq)
        feats_in = jnp.asarray(batch["features"])
        if seq_mesh is not None:
            # context-parallel: T sharded over chips, GSPMD inserts the
            # conv halos + attention collectives (parallel/long_video.py);
            # --seq_attn ring swaps the attention for the ring schedule
            from ..parallel.long_video import eval_sharded

            eval_model = model if flags.seq_attn == "gather" else \
                model.clone(ring_mesh=seq_mesh)

            def apply(v, x):
                out = eval_model.apply(v, x, train=False)
                return jax.nn.sigmoid(out["logits"]), out["feature"]

            probs, feats = eval_sharded(apply, {"params": state.params},
                                        feats_in, seq_mesh)
        else:
            probs, feats = eval_fn(state, feats_in)
        t = int(batch["length"])
        return np.asarray(probs[0][:t]), np.asarray(feats[0][:t]), seq

    def run_eval(videos, metric, collect=False):
        feats_out, preds_out = {}, {}
        for video in videos:
            probs, feats, seq = eval_video(video)
            metric.update(seq.labels[task], probs)
            metric.video_end()
            if collect:
                feats_out[video] = feats
                preds_out[video] = probs
        return feats_out, preds_out

    from ..metrics import Recognition

    metric = Recognition(num_classes)
    train_metric = Recognition(num_classes)
    logger.run_header("temporal_mstct", modelname, flags.version, flags.batch,
                      f"task {task} dims {flags.inter_channels}")
    result = {}

    if flags.train:
        from ..utils.preempt import install_preemption_guard

        guard = install_preemption_guard()
        for epoch in range(flags.epochs):
            order = list(split.train)
            np_rng.shuffle(order)
            # batch windows from several videos together (static shapes)
            for start in range(0, len(order), flags.batch):
                if guard.requested:
                    break
                group = order[start:start + flags.batch]
                wins = [sample_window(np_rng, ds[v], flags.window)
                        for v in group]
                maxlen = max(w.length for w in wins)
                feats = np.stack([
                    np.pad(w.features, ((0, maxlen - w.length), (0, 0)))
                    for w in wins])
                labels = np.stack([
                    np.pad(w.labels[task].astype(np.float32),
                           ((0, maxlen - w.length), (0, 0)))
                    for w in wins])
                state, m = train_step(state, {
                    "features": jnp.asarray(feats),
                    "labels": jnp.asarray(labels)})
                if flags.log_train_map:
                    probs, _ = eval_fn(state, jnp.asarray(feats))
                    for wi, w in enumerate(wins):
                        train_metric.update(labels[wi][: w.length],
                                            np.asarray(probs[wi][: w.length]))
                        train_metric.video_end()
            if guard.requested:
                ckpt.save(state, tag="latest")
                logger.log("preemption signal: saved _latest, stopping "
                           "training (resume with --resume)")
                result["preempted"] = True
                break
            scalars = {"loss": float(m["loss"])}
            if flags.log_train_map:
                scalars["train_mAP"] = train_metric.compute_video_AP()["mAP"]
                train_metric.reset_global()
            logger.scalars("train/loss", scalars, epoch)
            if epoch % flags.val_interval == 0:
                metric.reset_global()
                run_eval(split.val, metric)
                score = metric.compute_video_AP()["mAP"]
                behaviour = ckpt.update(state, score, epoch, logger.logfile)
                logger.log(f"epoch {epoch} val mAP[{task}] {score:.5f} "
                           f"ckpt {behaviour}")
        result["train_epochs"] = flags.epochs

    if flags.test:
        if ckpt.exists():
            state = ckpt.restore(state)
        metric.reset_global()
        run_eval(split.test, metric)
        res = metric.compute_video_AP(
            ignore_null=common.ignore_null_protocol(
                "temporal_mstct", flags.dataset_variant))
        logger.log(f"test mAP[{task}]: {res['mAP']:.5f}")
        result["test_mAP"] = res["mAP"]
        print(f"test mAP[{task}]:", round(res["mAP"], 4))

    if flags.dump:
        if ckpt.exists():
            state = ckpt.restore(state)
        out_store = FeatureStore(feats_root, flags.version or "Q2LMSTCT")
        dmetric = Recognition(num_classes)
        feats_out, preds_out = run_eval(split.all_videos, dmetric,
                                        collect=True)
        fpath = out_store.save(flags.kfold, "feats", feats_out, task=task)
        ppath = out_store.save(flags.kfold, "pred", preds_out, task=task)
        logger.log(f"Dumped {fpath} and {ppath}")
        result["dump_paths"] = (fpath, ppath)

    logger.close()
    return result


if __name__ == "__main__":
    main(sys.argv[1:])
