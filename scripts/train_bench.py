"""Training-step throughput on the real TPU chip (inference rows live in
bench_suite.py; this measures the KD-student TRAIN path).

One chained-scan program: N spatial KD train steps (ResNet18 + 4 heads +
cross-task attention, full hard+soft+MSE loss mix, SGD update, BN batch
stats) with the state threaded through the scan — every step's update
feeds the next, so nothing can be hoisted or overlapped away.

Run (TPU, single process!): python scripts/train_bench.py
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


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

        float(run(state, batch_data))
        t0 = time.perf_counter()
        float(run(state, batch_data))
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({
            "metric": f"KD-student train step {dtype_name} "
                      f"(b={batch}, 256x448, full hard+soft+MSE mix)",
            "per_step_ms": round(dt * 1e3, 2),
            "frames_per_sec": round(batch / dt, 1),
        }))


if __name__ == "__main__":
    main()
