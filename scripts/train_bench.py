"""Training-step throughput on the real TPU chip (inference rows live in
bench_suite.py; this measures the TRAIN paths of every heavy stage).

One chained-scan program per row: N train steps with the state threaded
through the scan — every step's update feeds the next, so nothing can be
hoisted or overlapped away. Rows (VERDICT r2 item 8 — the stages that
dominate the reference's wall-clock, e.g.
MT4MTLKD/Spatial_transformer/run.py:423-480 epoch loops):

  * KD student (ResNet18 + heads + cross-task attention, full loss mix)
  * Q2L SwinL-384 teacher (BCE component stage, remat backbone)
  * MS-TCT temporal teacher (B=31 windows x 256 frames, reference batch)
  * TCN full-video multi-task stage (6144 frames)
  * TERL contrastive stage (SwinT-224 MoCo queue/prototypes/EMA)

Run (TPU, single process!): python scripts/train_bench.py [row ...]
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def timed_steps(run, state, batch_data, iters):
    float(run(state, batch_data))
    t0 = time.perf_counter()
    float(run(state, batch_data))
    return (time.perf_counter() - t0) / iters


def report(name, dt, frames):
    print(json.dumps({
        "metric": name,
        "per_step_ms": round(dt * 1e3, 2),
        "frames_per_sec": round(frames / dt, 1),
    }), flush=True)


def main(batch=32, iters=10):
    from computervision_codes_tpu.models.spatial_cnn import SpatialCNN
    from computervision_codes_tpu.train import build_sgd, create_train_state
    from computervision_codes_tpu.train.trainer import make_spatial_train_step

    rng = np.random.default_rng(0)
    for dtype_name, dtype in (("bf16", jnp.bfloat16), ("fp32", jnp.float32)):
        model = SpatialCNN(network="resnet18", loss_type="all",
                           teacher_dim=1536, dtype=dtype)
        tx = build_sgd(1e-2, weight_decay=1e-5)
        img = jnp.zeros((1, 256, 448, 3), jnp.float32)
        tfeat = jnp.zeros((1, 1536), jnp.float32)
        state = create_train_state(model, tx, jax.random.PRNGKey(0),
                                   (img, tfeat, tfeat, tfeat))
        batch_data = {
            "image": jnp.asarray(
                rng.standard_normal((batch, 256, 448, 3)), jnp.float32),
            "label_i": jnp.zeros((batch, 6), jnp.float32),
            "label_v": jnp.zeros((batch, 10), jnp.float32),
            "label_t": jnp.zeros((batch, 15), jnp.float32),
            "label_ivt": jnp.zeros((batch, 100), jnp.float32),
            "teacher_pred_i": jnp.zeros((batch, 6), jnp.float32),
            "teacher_pred_v": jnp.zeros((batch, 10), jnp.float32),
            "teacher_pred_t": jnp.zeros((batch, 15), jnp.float32),
            "teacher_feat_i": jnp.zeros((batch, 1536), jnp.float32),
            "teacher_feat_v": jnp.zeros((batch, 1536), jnp.float32),
            "teacher_feat_t": jnp.zeros((batch, 1536), jnp.float32),
        }
        step = make_spatial_train_step(model, "all", rates=(1.0, 1.0, 1.0))

        @jax.jit
        def run(state, batch_data):
            def body(st, i):
                b = dict(batch_data,
                         image=batch_data["image"]
                         + (i % 2).astype(jnp.float32) * 1e-3)
                st, metrics = step(st, b)
                return st, metrics["loss"]

            st, losses = jax.lax.scan(body, state, jnp.arange(iters))
            return losses[-1]

        dt = timed_steps(run, state, batch_data, iters)
        report(f"KD-student train step {dtype_name} "
               f"(b={batch}, 256x448, full hard+soft+MSE mix)", dt, batch)


def q2l_teacher(batch=8, iters=6, fused_train=False, remat_policy=""):
    """Q2L SwinL-384 component-teacher train step (the heaviest stage the
    reference trains, Spatial_transformer/run.py:423-480). ``fused_train``
    routes the forward (and the remat replay) through the Pallas kernels
    with reference-autodiff backward (ops/swin_train)."""
    from computervision_codes_tpu.cli.spatial_transformer import (
        TOOL_POS_WEIGHT, VERB_POS_WEIGHT, TARGET_POS_WEIGHT)
    from computervision_codes_tpu.models.q2l import Q2L
    from computervision_codes_tpu.train import build_sgd, create_train_state
    from computervision_codes_tpu.train.trainer import make_spatial_train_step

    rng = np.random.default_rng(0)
    model = Q2L(backbone="swin_L_384_22k", loss_type="i",
                dtype=jnp.bfloat16, remat=True, fused_train=fused_train,
                remat_policy=remat_policy)
    tx = build_sgd(1e-2, weight_decay=1e-5)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               (jnp.zeros((1, 384, 384, 3), jnp.float32),))
    batch_data = {
        "image": jnp.asarray(rng.standard_normal((batch, 384, 384, 3)),
                             jnp.float32),
        "label_i": jnp.zeros((batch, 6), jnp.float32),
        "label_v": jnp.zeros((batch, 10), jnp.float32),
        "label_t": jnp.zeros((batch, 15), jnp.float32),
        "label_ivt": jnp.zeros((batch, 100), jnp.float32),
    }
    pw = {"i": TOOL_POS_WEIGHT, "v": VERB_POS_WEIGHT, "t": TARGET_POS_WEIGHT}
    step = make_spatial_train_step(model, "i", pos_weights=pw)

    @jax.jit
    def run(state, batch_data):
        def body(st, i):
            b = dict(batch_data, image=batch_data["image"]
                     + (i % 2).astype(jnp.float32) * 1e-3)
            st, metrics = step(st, b)
            return st, metrics["loss"]

        st, losses = jax.lax.scan(body, state, jnp.arange(iters))
        return losses[-1]

    dt = timed_steps(run, state, batch_data, iters)
    report(f"Q2L SwinL-384 teacher train step bf16 (b={batch}, remat"
           f"{':' + remat_policy if remat_policy else ''}"
           f"{', fused_train' if fused_train else ''})", dt, batch)


def mstct(batch=31, window=256, iters=10):
    """MS-TCT train step at the reference's B=31 window batch
    (Temporal_mstct/run.py:306)."""
    from computervision_codes_tpu.cli.temporal_mstct import (
        TASK_INFO, make_mstct_train_step)
    from computervision_codes_tpu.models.mstct import MSTCT
    from computervision_codes_tpu.train import build_sgd, create_train_state

    rng = np.random.default_rng(0)
    n_cls, pos_w = TASK_INFO["i"]
    model = MSTCT(num_classes=n_cls, dtype=jnp.bfloat16)
    tx = build_sgd(1e-2)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        (jnp.zeros((1, window, 1536), jnp.float32),))
    batch_data = {
        "features": jnp.asarray(
            rng.standard_normal((batch, window, 1536)), jnp.float32),
        "labels": jnp.zeros((batch, window, n_cls), jnp.float32),
    }
    step = make_mstct_train_step(model, "i", jnp.asarray(pos_w))

    @jax.jit
    def run(state, batch_data):
        def body(st, i):
            b = dict(batch_data, features=batch_data["features"]
                     + (i % 2).astype(jnp.float32) * 1e-3)
            st, metrics = step(st, b)
            return st, metrics["loss"]

        st, losses = jax.lax.scan(body, state, jnp.arange(iters))
        return losses[-1]

    dt = timed_steps(run, state, batch_data, iters)
    report(f"MS-TCT train step bf16 (b={batch} windows x {window})",
           dt, batch * window)


def tcn(frames=6144, iters=10):
    """Temporal TCN multi-task train step over one full video."""
    from computervision_codes_tpu.models.tcn import TemporalTCN
    from computervision_codes_tpu.train import build_sgd, create_train_state
    from computervision_codes_tpu.train.trainer import make_tcn_train_step

    rng = np.random.default_rng(0)
    model = TemporalTCN(dtype=jnp.bfloat16)
    tx = build_sgd(1e-2)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        (jnp.zeros((1, 256, 1536), jnp.float32),))
    batch_data = {
        "features": jnp.asarray(rng.standard_normal((1, frames, 1536)),
                                jnp.float32),
        "label_ivt": jnp.zeros((1, frames, 100), jnp.float32),
        "label_i": jnp.zeros((1, frames, 6), jnp.float32),
        "label_v": jnp.zeros((1, frames, 10), jnp.float32),
        "label_t": jnp.zeros((1, frames, 15), jnp.float32),
    }
    step = make_tcn_train_step(model)

    @jax.jit
    def run(state, batch_data):
        def body(st, i):
            b = dict(batch_data, features=batch_data["features"]
                     + (i % 2).astype(jnp.float32) * 1e-3)
            st, metrics = step(st, b)
            return st, metrics["loss_total"]

        st, losses = jax.lax.scan(body, state, jnp.arange(iters))
        return losses[-1]

    dt = timed_steps(run, state, batch_data, iters)
    report(f"TCN full-video train step bf16 ({frames} frames)", dt, frames)


def terl(batch=16, iters=6):
    """TERL contrastive train step (SwinT-224 + MoCo queue/prototypes/EMA,
    TERL/6_baseline_learnT/run.py:311-350)."""
    from computervision_codes_tpu.models.moco import (TERLModel,
                                                      select_tail_anchors)
    from computervision_codes_tpu.train import build_sgd
    from computervision_codes_tpu.train.terl import (create_terl_state,
                                                     make_terl_train_step)

    rng = np.random.default_rng(0)
    model = TERLModel(backbone="swin_T_224_1k", moco_dim=768, mlp=True,
                      dtype=jnp.bfloat16)
    state = create_terl_state(model, build_sgd(1e-5), jax.random.PRNGKey(0),
                              jnp.zeros((2, 224, 224, 3), jnp.float32),
                              queue_size=16384)
    tail = np.zeros((batch, 100))
    tail[0, 5] = tail[3, 42] = 1
    s, c, v = select_tail_anchors(tail, 2 * batch)
    batch_data = {
        "image1": jnp.asarray(rng.standard_normal((batch, 224, 224, 3)),
                              jnp.float32),
        "image2": jnp.asarray(rng.standard_normal((batch, 224, 224, 3)),
                              jnp.float32),
        "anchor_sample": jnp.asarray(s),
        "anchor_class": jnp.asarray(c),
        "anchor_valid": jnp.asarray(v),
    }
    for key, n in (("i", 6), ("v", 10), ("t", 15), ("ivt", 100)):
        batch_data[f"label_{key}"] = jnp.asarray(
            (rng.random((batch, n)) < 0.2).astype(np.float32))
    step = make_terl_train_step(model, w_epoch=0, kcl_k=0)

    @jax.jit
    def run(state, batch_data):
        def body(st, i):
            b = dict(batch_data, image1=batch_data["image1"]
                     + (i % 2).astype(jnp.float32) * 1e-3)
            st, metrics = step(st, b, jnp.asarray(1))
            return st, metrics["loss"]

        st, losses = jax.lax.scan(body, state, jnp.arange(iters))
        return losses[-1]

    dt = timed_steps(run, state, batch_data, iters)
    report(f"TERL contrastive train step bf16 (SwinT-224, b={batch}, "
           f"queue 16384)", dt, batch)


import functools as _ft

ROWS = {"kd": main, "q2l": q2l_teacher, "q2l_teacher": q2l_teacher,
        "q2l_fused": _ft.partial(q2l_teacher, fused_train=True),
        # GEMM-saveable remat: backward replays only the elementwise chain
        "q2l_dots": _ft.partial(q2l_teacher, remat_policy="dots"),
        "q2l_dots_fused": _ft.partial(q2l_teacher, remat_policy="dots",
                                      fused_train=True),
        # batch scaling under the winning dots policy (HBM headroom check
        # toward the 80-fps target)
        "q2l_dots_b16": _ft.partial(q2l_teacher, batch=16,
                                    remat_policy="dots"),
        "q2l_dots_b32": _ft.partial(q2l_teacher, batch=32, iters=4,
                                    remat_policy="dots"),
        "mstct": mstct, "tcn": tcn, "terl": terl}
DEFAULT_ROWS = ("kd", "q2l", "mstct", "tcn", "terl")

if __name__ == "__main__":
    for r in sys.argv[1:] or DEFAULT_ROWS:
        ROWS[r]()
