"""Does QAT shrink the int8-PTQ serving drift on a TRAINED student?

Trains the spatial student twice on a synthetic CholecT45-layout set —
plain float and --qat (weight fake-quant with STE, models/qat.py) — then
evaluates each checkpoint's test split two ways through the shared
per-video metric pipeline:

  * its own deployable float reference (plain weights / fake-quant
    weights respectively);
  * the int8-PTQ serving backbone (quantize_resnet + calibrated static
    scales, exactly models/quantized.py).

Reported: ivt test mAP per arm and the float->int8 drift per model. The
weight-side drift of the QAT arm is zero by construction (serving
quantization reproduces the train-time weights bit-for-bit); what this
measures is the remaining activation-scale drift and whether training
through the quantizer costs accuracy at equal epochs.

Run (CPU ok, ~15-30 min on this 1-core host):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/qat_efficacy.py
Recorded results live in RESULTS.md.
"""

import argparse
import json
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import jax
import jax.numpy as jnp


def eval_arms(root, ckpt_root, version, size, batch, qat):
    from computervision_codes_tpu.cli import common
    from computervision_codes_tpu.data.pipeline import (CholecDataset,
                                                        video_eval_batches)
    from computervision_codes_tpu.models.common import Classifier
    from computervision_codes_tpu.models.qat import qat_params
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

    ds = CholecDataset(root, "cholect45-crossval", 1, augmentation_list=[],
                       image_size=(size, size))
    split = ds.split
    model = SpatialCNN(network="resnet18", loss_type="ivt",
                       dtype=jnp.float32)
    tx = build_sgd(reference_warmup_exp_schedule(0.05, 0.1, 1, 0.99, 10),
                   weight_decay=1e-5)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        (jnp.zeros((1, size, size, 3), jnp.float32),))
    state = CheckpointManager(
        f"{ckpt_root}/run_{version}",
        "rendezvous_lcholect45-crossval_cholect1").restore(state)
    params = qat_params(state.params) if qat else state.params
    stats = state.batch_stats
    sizes, _ = VARIANTS["resnet18"]
    head = Classifier(100)

    def probs_from_pooled(pooled):
        logits = head.apply({"params": params["classifier_ivt"]}, pooled)
        return jax.nn.sigmoid(logits)

    @jax.jit
    def float_probs(x):
        pooled = model.apply({"params": params, "batch_stats": stats},
                             x)["feature"]
        return probs_from_pooled(pooled)

    qp = quantize_resnet(params["backbone"], stats["backbone"])
    calib = jnp.asarray(next(iter(
        video_eval_batches(ds, split.train[0], batch)))["image"],
        jnp.float32)
    qp = calibrate_resnet(qp, calib, sizes, dtype=jnp.float32)

    @jax.jit
    def int8_probs(x):
        pooled = quantized_resnet_apply(qp, x, sizes,
                                        dtype=jnp.float32)["pooled"]
        return probs_from_pooled(pooled)

    out = []
    for fn in (float_probs, int8_probs):
        rec = common.make_metrics()["ivt"]
        for video in split.test:
            for b in video_eval_batches(ds, video, batch):
                valid = b["valid"]
                p = np.asarray(fn(jnp.asarray(b["image"], jnp.float32)))
                rec.update(b["label_ivt"][valid], p[valid])
            rec.video_end()
        out.append(rec.compute_video_AP()["mAP"])
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", type=str, default="")
    p.add_argument("--size", type=int, default=48)
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--batch", type=int, default=16)
    a = p.parse_args()

    from computervision_codes_tpu.cli import spatial_cnn
    from computervision_codes_tpu.data.splits import resolve_split
    from computervision_codes_tpu.data.synthetic import write_synthetic_dataset

    root = a.root or tempfile.mkdtemp(prefix="qat_eff_") + "/data"
    split = resolve_split("cholect45-crossval", 1)
    write_synthetic_dataset(root, split.all_videos,
                            frames_per_video=a.frames, height=a.size,
                            width=a.size, seed=3)
    ck = root + "/ck"
    results = {}
    for mode, qat in (("float", False), ("qat", True)):
        argv = ["-t", "--data_dir", root, "-k", "1", "--loss_type", "ivt",
                "--epochs", str(a.epochs), "-b", str(a.batch),
                "--image_height", str(a.size), "--image_width", str(a.size),
                "--version", mode, "--ckpt_root", ck, "--val_interval", "2"]
        if qat:
            argv.append("--qat")
        spatial_cnn.main(argv)
        ref, int8 = eval_arms(root, ck, mode, a.size, a.batch, qat)
        results[mode] = {"ref_mAP": round(ref, 4),
                         "int8_mAP": round(int8, 4),
                         "drift": round(int8 - ref, 4)}
        print(json.dumps({"arm": mode, **results[mode]}), flush=True)
    print(json.dumps({
        "metric": "QAT efficacy (synthetic, ivt test mAP)",
        "float": results["float"], "qat": results["qat"],
        "drift_shrink": round(abs(results["float"]["drift"])
                              - abs(results["qat"]["drift"]), 4),
    }), flush=True)


if __name__ == "__main__":
    main()
