"""Weight QAT (models/qat.py): the fake-quant image must be EXACTLY the
serving PTQ policy's dequantized weights, gradients must pass straight
through, and the student train/eval steps must run through it."""

import jax
import jax.numpy as jnp
import numpy as np

from computervision_codes_tpu.models.qat import (fake_quant_convs,
                                                 fake_quant_kernel)
from computervision_codes_tpu.ops.quant import quantize_weight


def test_fake_quant_matches_serving_policy(rng):
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)), jnp.float32)
    fq = fake_quant_kernel(w)
    q, scale = quantize_weight(w)
    np.testing.assert_array_equal(np.asarray(fq),
                                  np.asarray(q.astype(jnp.float32) * scale))
    # straight-through estimator: d(sum fq)/dw == 1 everywhere
    g = jax.grad(lambda w: fake_quant_kernel(w).sum())(w)
    np.testing.assert_array_equal(np.asarray(g), 1.0)


def test_fake_quant_coverage_matches_quantize_resnet(rng):
    from computervision_codes_tpu.models.resnet import build_resnet

    model = build_resnet("resnet18")
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 32, 56, 3), jnp.float32))
    fq = fake_quant_convs(v["params"])
    # stem stays float (serving default), every stage conv is on the grid
    np.testing.assert_array_equal(
        np.asarray(fq["conv1"]["kernel"]),
        np.asarray(v["params"]["conv1"]["kernel"]))
    for name, blk in v["params"].items():
        if not name.startswith("layer"):
            continue
        for conv in ("conv1", "conv2", "downsample_conv"):
            if conv not in blk:
                continue
            want = fake_quant_kernel(blk[conv]["kernel"])
            np.testing.assert_array_equal(np.asarray(fq[name][conv]["kernel"]),
                                          np.asarray(want))
            assert not np.array_equal(np.asarray(fq[name][conv]["kernel"]),
                                      np.asarray(blk[conv]["kernel"]))


def test_qat_train_and_eval_steps(rng):
    """--qat end to end: loss decreases through the STE, and the eval step
    scores the fake-quant weights (the deployable model), not the float
    masters."""
    from computervision_codes_tpu.models.spatial_cnn import SpatialCNN
    from computervision_codes_tpu.train import build_sgd
    from computervision_codes_tpu.train.trainer import (
        create_train_state,
        make_spatial_eval_step,
        make_spatial_train_step,
    )

    model = SpatialCNN(network="resnet18", loss_type="ivt")
    img = jnp.zeros((1, 32, 56, 3), jnp.float32)
    state = create_train_state(model, build_sgd(0.05),
                               jax.random.PRNGKey(0), (img,))
    batch = {
        "image": jnp.asarray(rng.standard_normal((4, 32, 56, 3)),
                             jnp.float32),
        "label_i": jnp.zeros((4, 6)), "label_v": jnp.zeros((4, 10)),
        "label_t": jnp.zeros((4, 15)),
        "label_ivt": jnp.asarray((rng.random((4, 100)) < 0.1)
                                 .astype(np.float32)),
    }
    step = make_spatial_train_step(model, "ivt", qat=True)
    losses = []
    for _ in range(5):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]

    ev_float = make_spatial_eval_step(model)
    ev_qat = make_spatial_eval_step(model, qat=True)
    pf, _ = ev_float(state, batch["image"])
    pq, _ = ev_qat(state, batch["image"])
    assert not np.allclose(np.asarray(pf["ivt"]), np.asarray(pq["ivt"]))
