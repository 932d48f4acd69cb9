"""mAP preservation of the int8 (quant_eval) teacher on a TRAINED model.

Companion to scripts/int8_accuracy_check.py (which covers the student
conv path): loads a spatial-transformer checkpoint trained by the CLI
driver on synthetic CholecT45-layout data, evaluates the test split
through the SAME metric pipeline three ways — XLA float path, fused
Pallas kernels (bf16 parity), fused kernels with quant_eval int8 GEMMs —
and reports the mAP deltas. On CPU the fused kernels run in interpret
mode, so this checks the exact serving math without a chip.

Prepare + run (CPU):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m \
      computervision_codes_tpu.cli.spatial_transformer -t -e \
      --data_dir <root> -k 1 --loss_type i --backbone swin_nano_64 \
      --image_height 64 --image_width 64 --batch 4 --version q8 \
      --ckpt_root <ckpt>
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python \
      scripts/int8_teacher_accuracy.py --data_dir <root> --ckpt_root <ckpt>
"""

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", type=str, default="/tmp/vdrive/data")
    p.add_argument("--ckpt_root", type=str, default="/tmp/vdrive/ckpt")
    p.add_argument("--version", type=str, default="q8")
    p.add_argument("--backbone", type=str, default="swin_nano_64")
    p.add_argument("--loss_type", type=str, default="i")
    p.add_argument("--image_height", type=int, default=256)
    p.add_argument("--image_width", type=int, default=448)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--kfold", type=int, default=1)
    a = p.parse_args()

    import jax

    from computervision_codes_tpu.cli import common
    from computervision_codes_tpu.data.pipeline import CholecDataset
    from computervision_codes_tpu.models.q2l import Q2L
    from computervision_codes_tpu.train import (
        CheckpointManager,
        build_sgd,
        create_train_state,
        make_spatial_eval_step,
        reference_warmup_exp_schedule,
    )

    dataset = CholecDataset(a.data_dir, "cholect45-crossval", a.kfold,
                            image_size=(a.image_height, a.image_width))
    split = dataset.split

    variants = {
        "xla float": dict(fused_eval=False),
        "fused bf16-parity": dict(fused_eval=True),
        "fused int8 quant_eval": dict(fused_eval=True, quant_eval=True,
                                      quant_min_dim=0),
    }
    base = None
    for tag, kw in variants.items():
        model = Q2L(backbone=a.backbone, loss_type=a.loss_type,
                    dtype=jnp.float32, **kw)
        example = jnp.zeros((1, a.image_height, a.image_width, 3),
                            jnp.float32)
        # schedule + weight_decay match the driver so the optax chain
        # (and therefore the checkpointed opt_state pytree) restores
        tx = build_sgd(reference_warmup_exp_schedule(1e-3, 0.1, 9, 0.99, 10),
                       1e-5)
        state = create_train_state(model, tx, jax.random.PRNGKey(0),
                                   (example,))
        state = _restore(a, state)
        eval_step = make_spatial_eval_step(model)
        metrics = common.make_metrics()
        common.evaluate_videos(
            lambda images: eval_step(state, jnp.asarray(images)),
            dataset, split.test, a.batch, metrics)
        table = common.compute_map_table(metrics, a.loss_type, False)
        maps = {c: round(table[c]["mAP"], 5) for c in table}
        if base is None:
            base = maps
        delta = {c: round(maps[c] - base[c], 5) for c in maps}
        print(json.dumps({"variant": tag, "mAP": maps, "delta": delta}),
              flush=True)


def _restore(a, state):
    """Restore the driver's checkpoint by reproducing its naming."""
    import glob
    import os

    from computervision_codes_tpu.train import CheckpointManager

    model_dir = f"{a.ckpt_root}/run_{a.version}"
    cands = sorted(glob.glob(os.path.join(model_dir, "*_latest.msgpack"))
                   + glob.glob(os.path.join(model_dir, "*_latest.ckpt")))
    best = [c for c in sorted(glob.glob(os.path.join(model_dir, "*")))
            if c.endswith((".msgpack", ".ckpt"))
            and "_latest" not in os.path.basename(c)]
    target = (best or cands)
    if not target:
        raise SystemExit(f"no checkpoint under {model_dir}")
    name = os.path.basename(target[0]).rsplit(".", 1)[0]
    name = name.replace("_latest", "")
    ckpt = CheckpointManager(model_dir, name)
    return ckpt.restore(state)


if __name__ == "__main__":
    main()
