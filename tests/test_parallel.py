import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from computervision_codes_tpu.ops.attention import attention_reference
from computervision_codes_tpu.parallel.context import (
    all_gather_keys,
    sequence_parallel_attention,
    sequence_parallel_dilated_conv,
)
from computervision_codes_tpu.parallel.mesh import (
    DATA_AXIS,
    SEQ_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    shard_batch,
)


@pytest.fixture(scope="module")
def seq_mesh():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return make_mesh(n_data=1, n_seq=8)


@pytest.fixture(scope="module")
def data_mesh():
    return make_mesh(n_data=8)


def test_mesh_shapes(data_mesh, seq_mesh):
    assert data_mesh.shape[DATA_AXIS] == 8
    assert seq_mesh.shape[SEQ_AXIS] == 8


def test_sequence_parallel_attention_exact(seq_mesh, rng):
    q = jnp.asarray(rng.standard_normal((1, 2, 64, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 64, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 64, 16)), jnp.float32)
    want = attention_reference(q, k, v)
    got = sequence_parallel_attention(q, k, v, seq_mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_sequence_parallel_dilated_conv_exact(seq_mesh, rng):
    x = jnp.asarray(rng.standard_normal((2, 64, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 8, 8)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(8) * 0.1, jnp.float32)
    d = 4  # <= T_local (64/8 = 8)
    xp = jnp.pad(x, ((0, 0), (d, d), (0, 0)))
    want = (xp[:, :64] @ w[0] + xp[:, d:d + 64] @ w[1]
            + xp[:, 2 * d:2 * d + 64] @ w[2] + b)
    got = sequence_parallel_dilated_conv(x, w, b, d, seq_mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_moco_all_gather(data_mesh, rng):
    keys = jnp.asarray(rng.standard_normal((16, 4)), jnp.float32)
    labels = jnp.arange(16, dtype=jnp.int32)
    valid = jnp.ones(16, jnp.float32)

    def body(k, l, v):
        gk, gl, gv = all_gather_keys(k, l, v, DATA_AXIS)
        return gk, gl, gv

    fn = shard_map(body, mesh=data_mesh,
                   in_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)),
                   out_specs=(P(), P(), P()), check_rep=False)
    gk, gl, gv = fn(keys, labels, valid)
    # every device sees the full 16 anchors in order
    np.testing.assert_array_equal(np.asarray(gl), np.arange(16))
    np.testing.assert_allclose(np.asarray(gk), np.asarray(keys), rtol=1e-6)


@pytest.mark.slow
def test_data_parallel_train_step_matches_single_device(rng):
    """The sharded KD train step produces the same loss/grads as unsharded."""
    from computervision_codes_tpu.models.spatial_cnn import SpatialCNN
    from computervision_codes_tpu.train import build_sgd, create_train_state
    from computervision_codes_tpu.train.trainer import make_spatial_train_step

    mesh = make_mesh(n_data=8)
    model = SpatialCNN(network="resnet18", loss_type="ivt")
    tx = build_sgd(1e-2)
    img = jnp.zeros((1, 32, 32, 3), jnp.float32)
    state = create_train_state(model, tx, jax.random.PRNGKey(0), (img,))
    b = 8
    batch = {
        "image": jnp.asarray(rng.standard_normal((b, 32, 32, 3)), jnp.float32),
        "label_i": jnp.zeros((b, 6)), "label_v": jnp.zeros((b, 10)),
        "label_t": jnp.zeros((b, 15)),
        "label_ivt": jnp.asarray((rng.random((b, 100)) < 0.05).astype(np.float32)),
    }
    step = make_spatial_train_step(model, loss_type="ivt")
    # the train step donates its state buffers, and replicate() may alias on
    # CPU — give the sharded run a deep copy
    state_r = replicate(
        jax.tree.map(lambda x: jnp.array(x, copy=True)
                     if hasattr(x, "shape") else x, state), mesh)
    batch_s = shard_batch(batch, mesh)
    _, m_single = step(state, batch)
    _, m_sharded = step(state_r, batch_s)
    np.testing.assert_allclose(float(m_sharded["loss"]),
                               float(m_single["loss"]), rtol=1e-4)


def test_gspmd_context_parallel_mstct_and_tcn(seq_mesh, rng):
    """Full temporal models under GSPMD sequence sharding match the
    single-device result exactly (XLA inserts conv halos + attention
    collectives automatically)."""
    import jax.numpy as jnp

    from computervision_codes_tpu.models.mstct import MSTCT
    from computervision_codes_tpu.models.tcn import TemporalTCN
    from computervision_codes_tpu.parallel.long_video import eval_sharded

    feats = jnp.asarray(rng.standard_normal((1, 64, 12)), jnp.float32)

    mstct = MSTCT(embed_dims=(8, 8, 8, 8), num_blocks=1, num_heads=2,
                  mlp_ratio=1.0, final_embedding_dim=8, num_classes=5)
    mv = mstct.init(jax.random.PRNGKey(0), feats)
    want = mstct.apply(mv, feats)["logits"]
    got = eval_sharded(lambda v, x: mstct.apply(v, x)["logits"], mv, feats,
                       seq_mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    tcn = TemporalTCN(num_layers_pg=3, num_layers_r=2, num_refinements=2,
                      num_f_maps=8, num_classes=5, channel_dropout=0.0)
    tv = tcn.init(jax.random.PRNGKey(0), feats)
    want = tcn.apply(tv, feats)["ivt"][0]
    got = eval_sharded(lambda v, x: tcn.apply(v, x)["ivt"][0], tv, feats,
                       seq_mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_ring_attention_exact(seq_mesh, rng):
    import jax.numpy as jnp

    from computervision_codes_tpu.parallel.ring_attention import ring_attention

    q = jnp.asarray(rng.standard_normal((2, 3, 64, 16)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, 3, 64, 16)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, 3, 64, 16)), jnp.float32)
    want = attention_reference(q, k, v)
    got = ring_attention(q, k, v, seq_mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.slow
def test_terl_step_data_parallel_matches_single(rng):
    """The TERL contrastive step under a sharded data axis matches the
    single-device result (queue updates and anchor gathers included) — the
    reference's concat_all_gather stub become a real multi-chip feature."""
    import jax.numpy as jnp

    from computervision_codes_tpu.models.moco import (
        TERLModel,
        select_tail_anchors,
    )
    from computervision_codes_tpu.train import build_sgd
    from computervision_codes_tpu.train.terl import (
        create_terl_state,
        make_terl_train_step,
    )

    mesh = make_mesh(n_data=8)
    model = TERLModel(backbone="swin_nano_64", moco_dim=256, mlp=True)
    imgs = jnp.zeros((2, 64, 64, 3), jnp.float32)

    def fresh_state():
        return create_terl_state(model, build_sgd(1e-3),
                                 jax.random.PRNGKey(0), imgs, queue_size=64)

    b = 8
    tail = np.zeros((b, 100))
    tail[0, 5] = 1
    tail[5, 42] = 1
    s, c, v = select_tail_anchors(tail, 16)
    batch = {
        "image1": jnp.asarray(rng.standard_normal((b, 64, 64, 3)), jnp.float32),
        "image2": jnp.asarray(rng.standard_normal((b, 64, 64, 3)), jnp.float32),
        "anchor_sample": jnp.asarray(s),
        "anchor_class": jnp.asarray(c),
        "anchor_valid": jnp.asarray(v),
    }
    for key, n in (("i", 6), ("v", 10), ("t", 15), ("ivt", 100)):
        batch[f"label_{key}"] = jnp.asarray(
            (rng.random((b, n)) < 0.2).astype(np.float32))

    step = make_terl_train_step(model, w_epoch=0, kcl_k=0)  # k=0: no sampling rng
    _, m_single = step(fresh_state(), batch, jnp.asarray(1))

    # images sharded over data; anchor index arrays replicated (they index
    # into the global batch)
    state_r = replicate(fresh_state(), mesh)
    sh = batch_sharding(mesh)
    rep = replicate
    batch_s = dict(batch)
    for key in ("image1", "image2"):
        batch_s[key] = jax.device_put(batch[key], sh)
    _, m_sharded = step(state_r, batch_s, jnp.asarray(1))
    np.testing.assert_allclose(float(m_sharded["loss"]),
                               float(m_single["loss"]), rtol=2e-4)


def test_mstct_ring_attention_model_level_exact(seq_mesh, rng):
    """MSTCT with ring_mesh set (--seq_attn ring): T-sharded eval with the
    ring attention schedule inside every GLR block matches the
    single-device model exactly."""
    import jax.numpy as jnp

    from computervision_codes_tpu.models.mstct import MSTCT
    from computervision_codes_tpu.parallel.long_video import eval_sharded

    feats = jnp.asarray(rng.standard_normal((1, 64, 12)), jnp.float32)
    mstct = MSTCT(embed_dims=(8, 8, 8, 8), num_blocks=1, num_heads=2,
                  mlp_ratio=1.0, final_embedding_dim=8, num_classes=5)
    mv = mstct.init(jax.random.PRNGKey(0), feats)
    want = mstct.apply(mv, feats)["logits"]

    ring_model = mstct.clone(ring_mesh=seq_mesh)
    got = eval_sharded(lambda v, x: ring_model.apply(v, x)["logits"],
                       mv, feats, seq_mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
