import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from computervision_codes_tpu.models.spatial_cnn import SpatialCNN
from computervision_codes_tpu.models.tcn import TemporalTCN
from computervision_codes_tpu.train import (
    CheckpointManager,
    build_sgd,
    create_train_state,
    imbsam_gradients,
    make_spatial_train_step,
    make_tcn_eval_step,
    make_tcn_train_step,
    reference_warmup_exp_schedule,
    sam_gradients,
)


def test_schedule_matches_torch_sequential_lr():
    # reference recipe: MT4MTLKD/Spatial_cnn/run.py:342-351
    peak, power, warmup, gamma = 0.01, 0.1, 9, 0.99
    wp = peak / power
    lin = torch.nn.Linear(2, 2)
    opt = torch.optim.SGD(lin.parameters(), lr=wp)
    a = torch.optim.lr_scheduler.LinearLR(opt, start_factor=power,
                                          total_iters=warmup)
    b = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=gamma)
    sch = torch.optim.lr_scheduler.SequentialLR(opt, [a, b],
                                                milestones=[warmup + 1])
    sched = reference_warmup_exp_schedule(peak, power, warmup, gamma,
                                          steps_per_epoch=1)
    for epoch in range(25):
        want = opt.param_groups[0]["lr"]
        got = float(sched(epoch))
        np.testing.assert_allclose(got, want, rtol=1e-5,
                                   err_msg=f"epoch {epoch}")
        sch.step()


def test_sam_gradients_match_manual(rng):
    def loss(p):
        return jnp.sum((p["w"] - 2.0) ** 4)

    params = {"w": jnp.asarray(rng.standard_normal(4), jnp.float32)}
    rho = 0.05
    g1 = jax.grad(loss)(params)
    norm = jnp.sqrt(sum(jnp.sum(g ** 2) for g in jax.tree.leaves(g1))) + 1e-16
    pert = {"w": params["w"] + g1["w"] * rho / norm}
    want = jax.grad(loss)(pert)
    got = sam_gradients(loss, params, rho)
    np.testing.assert_allclose(np.asarray(got["w"]), np.asarray(want["w"]),
                               rtol=1e-6)


def test_imbsam_combines_head_and_tail(rng):
    def head(p):
        return jnp.sum(p["w"] ** 2)

    def tail(p):
        return jnp.sum((p["w"] - 1.0) ** 2)

    params = {"w": jnp.asarray(rng.standard_normal(3), jnp.float32)}
    got = imbsam_gradients(head, tail, params, rho=0.01)
    g_head = jax.grad(head)(params)
    # tail gradient at perturbed point + head gradient
    g_tail = jax.grad(tail)(params)
    norm = jnp.sqrt(jnp.sum(g_tail["w"] ** 2)) + 1e-16
    pert = {"w": params["w"] + g_tail["w"] * 0.01 / norm}
    want = jax.grad(tail)(pert)["w"] + g_head["w"]
    np.testing.assert_allclose(np.asarray(got["w"]), np.asarray(want),
                               rtol=1e-6)


@pytest.fixture  # function-scoped: donated buffers cannot be shared
def tiny_spatial():
    model = SpatialCNN(network="resnet18", loss_type="ivt")
    sched = reference_warmup_exp_schedule(0.01, 0.1, 2, 0.99, steps_per_epoch=2)
    tx = build_sgd(sched, weight_decay=1e-5)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        (jnp.zeros((2, 32, 56, 3), jnp.float32),))
    return model, state


def _spatial_batch(rng, b=2):
    return {
        "image": jnp.asarray(rng.standard_normal((b, 32, 56, 3)), jnp.float32),
        "label_i": jnp.asarray((rng.random((b, 6)) < 0.3).astype(np.float32)),
        "label_v": jnp.asarray((rng.random((b, 10)) < 0.3).astype(np.float32)),
        "label_t": jnp.asarray((rng.random((b, 15)) < 0.3).astype(np.float32)),
        "label_ivt": jnp.asarray((rng.random((b, 100)) < 0.05).astype(np.float32)),
    }


def test_spatial_train_step_reduces_loss(tiny_spatial, rng):
    model, state = tiny_spatial
    step = make_spatial_train_step(model, loss_type="ivt")
    batch = _spatial_batch(rng)
    losses = []
    for _ in range(5):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert state.step == 5
    # batch stats actually updated
    assert state.batch_stats is not None


@pytest.mark.slow
def test_spatial_train_step_sam(tiny_spatial, rng):
    """--optimizer sam: the SAM step trains and one SAM update differs
    from one plain-SGD update from the same init (the ascent perturbation
    changes the descent gradient)."""
    model, state = tiny_spatial
    batch = _spatial_batch(rng)
    sgd_state, _ = make_spatial_train_step(model, loss_type="ivt")(
        jax.tree.map(jnp.copy, state), batch)
    step = make_spatial_train_step(model, loss_type="ivt", sam_rho=0.5)
    sam_state, _ = step(jax.tree.map(jnp.copy, state), batch)
    deltas = jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        sgd_state.params, sam_state.params))
    assert max(deltas) > 0
    # and it optimizes
    losses = []
    for _ in range(5):
        sam_state, metrics = step(sam_state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]


@pytest.mark.slow
def test_zero_rate_terms_ignore_nonfinite_teachers(rng):
    """--rates 1 0 0 must be immune to NaN teacher artifacts: zero-rate
    loss terms are skipped at trace time (0 * nan = nan otherwise, which
    poisoned a full pipeline run — scripts/kd_efficacy.py)."""
    model = SpatialCNN(network="resnet18", loss_type="all", teacher_dim=16)
    tx = build_sgd(0.01)
    b = 2
    img = jnp.zeros((1, 32, 56, 3), jnp.float32)
    tf = jnp.zeros((1, 16), jnp.float32)
    state = create_train_state(model, tx, jax.random.PRNGKey(0),
                               (img, tf, tf, tf))
    batch = _spatial_batch(rng)
    batch.update({
        f"teacher_feat_{k}": jnp.full((b, 16), jnp.nan) for k in "ivt"})
    batch.update({
        "teacher_pred_i": jnp.full((b, 6), jnp.nan),
        "teacher_pred_v": jnp.full((b, 10), jnp.nan),
        "teacher_pred_t": jnp.full((b, 15), jnp.nan),
    })
    step = make_spatial_train_step(model, loss_type="all", rates=(1, 0, 0))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert "soft_loss" not in metrics and "kd_loss" not in metrics


def test_tcn_train_and_eval(rng):
    model = TemporalTCN(num_layers_pg=3, num_layers_r=2, num_refinements=3,
                        num_f_maps=16, num_classes=100)
    tx = build_sgd(1e-2)
    feats = jnp.asarray(rng.standard_normal((1, 24, 8)), jnp.float32)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), (feats,))
    step = make_tcn_train_step(model)
    batch = {
        "features": feats,
        "label_ivt": jnp.asarray((rng.random((24, 100)) < 0.05).astype(np.float32)),
        "label_i": jnp.asarray((rng.random((24, 6)) < 0.3).astype(np.float32)),
        "label_v": jnp.asarray((rng.random((24, 10)) < 0.3).astype(np.float32)),
        "label_t": jnp.asarray((rng.random((24, 15)) < 0.3).astype(np.float32)),
    }
    l0 = None
    for i in range(4):
        state, m = step(state, batch)
        if i == 0:
            l0 = float(m["loss_total"])
    assert float(m["loss_total"]) < l0
    probs = make_tcn_eval_step(model)(state, feats)
    assert probs["ivt"].shape == (1, 24, 100)
    assert float(jnp.max(probs["ivt"])) <= 1.0


def test_checkpoint_policy(tmp_path, tiny_spatial):
    model, state = tiny_spatial
    mgr = CheckpointManager(str(tmp_path), "m_cholect45-crossval_k1")
    assert mgr.update(state, 0.5, epoch=0) == "increased"
    assert mgr.update(state, 0.4, epoch=1) == "decreased"
    assert mgr.update(state, 0.6, epoch=2) == "increased"
    assert mgr.exists() and mgr.exists("latest")
    # roundtrip restore preserves params and step
    restored = mgr.restore(state)
    leaves_a = jax.tree.leaves(state.params)
    leaves_b = jax.tree.leaves(restored.params)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # a fresh manager remembers the best score from the sidecar
    mgr2 = CheckpointManager(str(tmp_path), "m_cholect45-crossval_k1")
    assert mgr2.update(state, 0.55, epoch=3) == "decreased"


def test_logger_events(tmp_path):
    from computervision_codes_tpu.utils.logging import (
        ExperimentLogger,
        summarize_events,
    )

    lg = ExperimentLogger(str(tmp_path), "model1")
    lg.run_header("run.py", "model1", "v0", 32, "peak 0.01")
    lg.scalars("train/loss", {"loss": 1.5}, step=1)
    lg.scalars("train/loss", {"loss": 1.2}, step=2)
    lg.scalars("val/mAP", {"mAP_ivt": 0.3}, step=1)
    lg.close()
    evs = summarize_events(lg.events_path, "train/loss")
    assert [e["values"]["loss"] for e in evs] == [1.5, 1.2]
    with open(lg.logfile) as f:
        content = f.read()
    assert "JAX/TPU" in content and content.count("*") > 20


def test_checkpoint_orbax_backend(tmp_path, tiny_spatial):
    model, state = tiny_spatial
    mgr = CheckpointManager(str(tmp_path), "m_orbax", backend="orbax")
    assert mgr.update(state, 0.5, epoch=0) == "increased"
    restored = mgr.restore(state)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)


@pytest.mark.slow
def test_checkpoint_orbax_sharded_roundtrip(tmp_path, tiny_spatial, rng):
    """Orbax save/restore of a TrainState laid out over the 8-device mesh
    (params replicated, as in DP training): bitwise round-trip, restored
    state usable in the sharded train step, best-score sidecar intact
    (SURVEY §5 checkpoint subsystem under multi-chip)."""
    from computervision_codes_tpu.parallel.mesh import (make_mesh, replicate,
                                                        shard_batch)

    model, state = tiny_spatial
    mesh = make_mesh(n_data=8)
    state_r = replicate(state, mesh)
    mgr = CheckpointManager(str(tmp_path), "m_sharded", backend="orbax")
    assert mgr.update(state_r, 0.5, epoch=0) == "increased"

    template = replicate(
        jax.tree.map(lambda x: jnp.zeros_like(x) if hasattr(x, "shape")
                     else x, state), mesh)
    restored = mgr.restore(template)
    for a, b in zip(jax.tree.leaves(state_r.params),
                    jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state_r.step)

    # the restored state must drive the sharded step (shardings usable)
    restored = replicate(
        jax.tree.map(lambda x: jnp.array(x, copy=True)
                     if hasattr(x, "shape") else x, restored), mesh)
    step = make_spatial_train_step(model, loss_type="ivt")
    batch = shard_batch(_spatial_batch(rng, b=8), mesh)
    _, m = step(restored, batch)
    assert np.isfinite(float(m["loss"]))

    # sidecar survives a fresh manager
    mgr2 = CheckpointManager(str(tmp_path), "m_sharded", backend="orbax")
    assert mgr2.best_score == 0.5


@pytest.mark.slow
def test_q2l_resnet_backbone_trains_through_driver_state(rng):
    """Regression: Q2L ResNet backbones keep FrozenBatchNorm constants in a
    'frozen' collection that create_train_state used to drop, crashing the
    spatial_transformer driver on --backbone resnet18/50."""
    from computervision_codes_tpu.models.q2l import Q2L
    from computervision_codes_tpu.train import build_sgd, create_train_state
    from computervision_codes_tpu.train.trainer import (
        make_spatial_eval_step,
        make_spatial_train_step,
    )

    model = Q2L(backbone="resnet18", loss_type="i")
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    state = create_train_state(model, build_sgd(1e-2), jax.random.PRNGKey(0),
                               (img,))
    assert state.frozen is not None
    batch = {"image": jnp.asarray(rng.standard_normal((2, 64, 64, 3)),
                                  jnp.float32)}
    for k, n in (("i", 6), ("v", 10), ("t", 15), ("ivt", 100)):
        batch[f"label_{k}"] = jnp.zeros((2, n), jnp.float32)
    step = make_spatial_train_step(model, "i")
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    probs, feat = make_spatial_eval_step(model)(state, batch["image"])
    assert probs["i"].shape == (2, 6) and feat.shape == (2, 512)
