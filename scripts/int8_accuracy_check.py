"""mAP preservation of the int8-PTQ backbone on a REAL trained student.

The unit guards (tests/test_quantized.py) check random-weight fidelity;
this drives the question that matters for serving: does quantizing a
TRAINED student's backbone change its task mAP? Uses the KD student
checkpoint from scripts/kd_efficacy.py (synthetic CholecT45-layout data),
evaluates the test split three ways — float32, int8 dynamic scales, int8
calibrated static scales (the fast serving config) — through the same
per-video metric pipeline, and reports the deltas.

Run (CPU ok):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/int8_accuracy_check.py --root /tmp/kd24
Recorded results live in RESULTS.md.
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", type=str, default="/tmp/kd24")
    p.add_argument("--version", type=str, default="kd")
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--batch", type=int, default=16)
    a = p.parse_args()

    from computervision_codes_tpu.cli import common
    from computervision_codes_tpu.data.pipeline import (
        CholecDataset,
        video_eval_batches,
    )
    from computervision_codes_tpu.models.common import Classifier
    from computervision_codes_tpu.models.quantized import (
        calibrate_resnet,
        quantize_resnet,
        quantized_resnet_apply,
    )
    from computervision_codes_tpu.models.resnet import VARIANTS
    from computervision_codes_tpu.models.spatial_cnn import SpatialCNN
    from computervision_codes_tpu.train import (
        CheckpointManager,
        build_sgd,
        create_train_state,
        reference_warmup_exp_schedule,
    )

    ds = CholecDataset(a.root, "cholect45-crossval", 1,
                       augmentation_list=[],
                       image_size=(a.size, a.size))
    split = ds.split

    model = SpatialCNN(network="resnet18", loss_type="all", teacher_dim=512,
                      dtype=jnp.float32)
    # the opt-state TREE must match the driver's exactly for restore:
    # scheduled sgd (count state) + weight decay chain
    sched = reference_warmup_exp_schedule(0.05, 0.1, 1, 0.99, 10)
    tx = build_sgd(sched, weight_decay=1e-5)
    img = jnp.zeros((1, a.size, a.size, 3), jnp.float32)
    tf = jnp.zeros((1, 512), jnp.float32)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               (img, tf, tf, tf))
    ckpt = CheckpointManager(f"{a.root}/ckpt/run_{a.version}",
                             "rendezvous_lcholect45-crossval_cholect1")
    state = ckpt.restore(state)
    params, stats = state.params, state.batch_stats
    sizes, _ = VARIANTS["resnet18"]

    heads = {k: Classifier({"i": 6, "v": 10, "t": 15, "ivt": 100}[k])
             for k in ("i", "v", "t", "ivt")}

    def eval_map(backbone_fn, tag):
        metrics = common.make_metrics()
        t0 = time.time()
        for video in split.test:
            for b in video_eval_batches(ds, video, a.batch):
                s = backbone_fn(jnp.asarray(b["image"]))
                probs = {
                    k: jax.nn.sigmoid(heads[k].apply(
                        {"params": params[f"classifier_{k}"]}, s))
                    for k in ("i", "v", "t", "ivt")}
                valid = b["valid"]
                for k, m in metrics.items():
                    m.update(b[f"label_{k}"][valid],
                             np.asarray(probs[k])[valid])
            for m in metrics.values():
                m.video_end()
        out = {k: round(m.compute_video_AP()["mAP"], 4)
               for k, m in metrics.items()}
        print(json.dumps({"path": tag, "test_mAP": out,
                          "secs": round(time.time() - t0, 1)}))
        return out

    @jax.jit
    def float_bb(x):
        return model.apply({"params": params, "batch_stats": stats},
                           x)["feature"]

    ref = eval_map(float_bb, "float32")

    qp = quantize_resnet(params["backbone"], stats["backbone"])

    @jax.jit
    def int8_dyn(x):
        return quantized_resnet_apply(qp, x, sizes, dtype=jnp.float32)[
            "pooled"]

    dyn = eval_map(int8_dyn, "int8 dynamic scales")

    calib = jnp.asarray(next(iter(
        video_eval_batches(ds, split.train[0], a.batch)))["image"])
    qps = calibrate_resnet(qp, calib, sizes, dtype=jnp.float32)

    @jax.jit
    def int8_static(x):
        return quantized_resnet_apply(qps, x, sizes, dtype=jnp.float32)[
            "pooled"]

    sta = eval_map(int8_static, "int8 static scales (calibrated)")

    deltas = {k: round(sta[k] - ref[k], 4) for k in ref}
    print(json.dumps({"delta_static_vs_float": deltas}))
    worst = max(abs(v) for v in deltas.values())
    assert worst <= 0.01, f"int8 static mAP drifted > 1 point: {deltas}"
    print(f"int8 serving config preserves mAP within {worst:.4f}")


if __name__ == "__main__":
    main()
