import jax
import jax.numpy as jnp
import numpy as np
import pytest

from computervision_codes_tpu.models.moco import TERLModel, select_tail_anchors
from computervision_codes_tpu.train import build_sgd
from computervision_codes_tpu.train.terl import (
    create_terl_state,
    make_terl_eval_step,
    make_terl_train_step,
)


@pytest.fixture  # function-scoped: donated buffers cannot be shared
def terl_setup():
    model = TERLModel(backbone="swin_nano_64", moco_dim=256, mlp=True)
    tx = build_sgd(1e-2)
    imgs = jnp.zeros((2, 64, 64, 3), jnp.float32)
    state = create_terl_state(model, tx, jax.random.PRNGKey(0), imgs,
                              queue_size=32)
    return model, state


def _batch(rng, b=2, max_anchors=4):
    tail = np.zeros((b, 100))
    tail[0, 5] = 1
    tail[1, 42] = 1
    s, c, v = select_tail_anchors(tail, max_anchors)
    return {
        "image1": jnp.asarray(rng.standard_normal((b, 64, 64, 3)), jnp.float32),
        "image2": jnp.asarray(rng.standard_normal((b, 64, 64, 3)), jnp.float32),
        "label_i": jnp.asarray((rng.random((b, 6)) < 0.3).astype(np.float32)),
        "label_v": jnp.asarray((rng.random((b, 10)) < 0.3).astype(np.float32)),
        "label_t": jnp.asarray((rng.random((b, 15)) < 0.3).astype(np.float32)),
        "label_ivt": jnp.asarray((rng.random((b, 100)) < 0.05).astype(np.float32)),
        "anchor_sample": jnp.asarray(s),
        "anchor_class": jnp.asarray(c),
        "anchor_valid": jnp.asarray(v),
    }


@pytest.mark.slow
def test_terl_train_step_full(terl_setup, rng):
    model, state = terl_setup
    step = make_terl_train_step(model, w_epoch=1, kcl_k=2)
    batch = _batch(rng)
    ptr0 = int(state.queue.ptr)
    # materialize before stepping: the train step donates the state buffers
    key0 = np.asarray(state.key_params["encoder"]["cam_ivt"]["kernel"])
    # warmup epoch
    state, m = step(state, batch, jnp.asarray(0))
    assert np.isfinite(float(m["loss"]))
    assert "loss_con" in m
    # post-warmup epoch adds proto/tail terms
    state, m2 = step(state, batch, jnp.asarray(5))
    assert float(m2["loss"]) != float(m["loss"])
    assert np.isfinite(float(m2["loss_proto"]))
    assert np.isfinite(float(m2["loss_tail"]))
    # queue advanced by valid anchors (2 per step x 2 steps)
    assert int(state.queue.ptr) == ptr0 + 4
    # key params moved toward query params (EMA), not equal to old
    # (cam_ivt gets gradients; the mlp head does not — it's unused in the
    # loss, matching the reference)
    key1 = state.key_params["encoder"]["cam_ivt"]["kernel"]
    assert not np.allclose(np.asarray(key0), np.asarray(key1))


def test_terl_no_tail_batch_is_finite(terl_setup, rng):
    model, state = terl_setup
    step = make_terl_train_step(model, w_epoch=0, kcl_k=2)
    batch = _batch(rng)
    batch["anchor_valid"] = jnp.zeros_like(batch["anchor_valid"])
    state, m = step(state, batch, jnp.asarray(3))
    # reference `continue`s on tail-free batches; here the masked losses
    # are finite (proto/tail terms vanish) and nothing NaNs
    assert np.isfinite(float(m["loss"]))
    assert int(state.queue.ptr) == 0  # nothing enqueued


def test_terl_eval_step(terl_setup, rng):
    model, state = terl_setup
    ev = make_terl_eval_step(model)
    probs, feats = ev(state, jnp.asarray(rng.standard_normal((2, 64, 64, 3)),
                                         jnp.float32))
    assert probs["ivt"].shape == (2, 100)
    assert feats.shape == (2, 256)  # swin_nano_64 feature dim
    assert float(jnp.max(probs["ivt"])) <= 1.0


def test_terl_classification_only_mode(rng):
    model = TERLModel(backbone="swin_nano_64", moco_dim=256, mlp=False)
    tx = build_sgd(1e-2)
    imgs = jnp.zeros((2, 64, 64, 3), jnp.float32)
    state = create_terl_state(model, tx, jax.random.PRNGKey(0), imgs,
                              queue_size=16)
    step = make_terl_train_step(model, use_mlp=False)
    state, m = step(state, _batch(rng), jnp.asarray(0))
    assert np.isfinite(float(m["loss"]))
    assert "loss_con" not in m


@pytest.mark.slow
def test_fix_backbone_freezes_patch_embed_and_early_stages(rng):
    from computervision_codes_tpu.train import freeze_swin_early

    model = TERLModel(backbone="swin_nano_64", moco_dim=256, mlp=True)
    tx = freeze_swin_early(build_sgd(1e-1))
    imgs = jnp.zeros((2, 64, 64, 3), jnp.float32)
    state = create_terl_state(model, tx, jax.random.PRNGKey(0), imgs,
                              queue_size=32)
    bb0 = jax.tree.map(np.asarray, state.params["encoder"]["backbone"])
    step = make_terl_train_step(model, w_epoch=1, kcl_k=2)
    state, _ = step(state, _batch(rng), jnp.asarray(0))
    bb1 = state.params["encoder"]["backbone"]
    frozen = ("patch_embed", "patch_norm", "stage0_block0", "merge0",
              "stage1_block0", "merge1")
    for name in frozen:
        same = jax.tree.map(
            lambda a, b: np.array_equal(np.asarray(a), np.asarray(b)),
            bb0[name], bb1[name])
        assert all(jax.tree.leaves(same)), f"{name} should be frozen"
    # late stages still learn
    moved = jax.tree.map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
        bb0["stage2_block0"], bb1["stage2_block0"])
    assert any(jax.tree.leaves(moved)), "stage2 should update"
