import jax
import jax.numpy as jnp
import numpy as np

from computervision_codes_tpu.models.moco import (
    CamDisentangle,
    MoCoEncoder,
    anchor_features,
    enqueue,
    init_queue,
    moco_logits,
    momentum_update,
    prototype_logits,
    queue_positive_mask,
    select_tail_anchors,
    update_prototypes,
)


def test_moco_encoder_outputs(rng):
    enc = MoCoEncoder(backbone="swin_nano_64", moco_dim=32, mlp=True)
    img = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), img)
    out = enc.apply(variables, img)
    assert out["mlp_feat"].shape == (2, 32)
    assert out["cams"]["ivt"].shape[0] == 2 and out["cams"]["ivt"].shape[-1] == 100
    assert out["logits"]["i"].shape == (2, 6)
    assert out["logits"]["t"].shape == (2, 15)
    # logits are GAP of cams
    np.testing.assert_allclose(
        np.asarray(out["logits"]["ivt"]),
        np.asarray(out["cams"]["ivt"].mean(axis=(1, 2))), rtol=1e-5)


def test_ht_split_heads(rng):
    masks = {t: (np.zeros(n, np.float32), np.ones(n, np.float32))
             for t, n in (("i", 6), ("v", 10), ("t", 15), ("ivt", 100))}
    enc = MoCoEncoder(backbone="swin_nano_64", moco_dim=16, ht=True)
    img = jnp.ones((1, 64, 64, 3), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), img, ht_masks=masks)
    out = enc.apply(variables, img, ht_masks=masks)
    assert out["logits"]["v"].shape == (1, 10)


def test_anchor_selection_and_features(rng):
    tail = np.zeros((3, 100))
    tail[0, 5] = 1
    tail[2, 40] = 1
    tail[2, 41] = 1
    s, c, v = select_tail_anchors(tail, max_anchors=6)
    np.testing.assert_array_equal(s[:3], [0, 2, 2])
    np.testing.assert_array_equal(c[:3], [5, 40, 41])
    assert v.sum() == 3

    enc_out = {
        "fmap": jnp.asarray(rng.standard_normal((3, 2, 2, 8)), jnp.float32),
        "cams": {"ivt": jnp.asarray(rng.standard_normal((3, 2, 2, 100)),
                                    jnp.float32)},
    }
    disen = CamDisentangle(channels=8)
    params = disen.init(jax.random.PRNGKey(0), enc_out["fmap"][:1],
                        enc_out["cams"]["ivt"][:1, :, :, 0])
    feats, maps = anchor_features(disen, params, enc_out, jnp.asarray(s),
                                  jnp.asarray(c))
    assert feats.shape == (6, 8)
    assert maps.shape == (6, 2, 2, 8)


def test_queue_ring_buffer():
    q = init_queue(jax.random.PRNGKey(0), k=8, dim=4)
    # norms are 1
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q.feats), axis=-1),
                               1.0, rtol=1e-5)
    keys = jnp.arange(12, dtype=jnp.float32).reshape(3, 4)
    lab = jnp.asarray([7, 13, 99], jnp.int32)
    valid = jnp.asarray([1.0, 0.0, 1.0])
    q2 = enqueue(q, keys, lab, valid)
    assert int(q2.ptr) == 2  # only 2 valid anchors written
    np.testing.assert_array_equal(np.asarray(q2.feats[0]), [0, 1, 2, 3])
    np.testing.assert_array_equal(np.asarray(q2.feats[1]), [8, 9, 10, 11])
    assert int(q2.l_ivt[0]) == 7 and int(q2.l_ivt[1]) == 99
    # component labels derived through the bank
    from computervision_codes_tpu.data.bank import load_bank

    bank = load_bank()
    assert int(q2.l_i[0]) == bank[7, 1] and int(q2.l_v[1]) == bank[99, 2]

    # truncation at the end of the buffer (reference semantics)
    q3 = q2.replace(ptr=jnp.asarray(7, jnp.int32))
    q4 = enqueue(q3, keys, lab, jnp.ones(3))
    assert int(q4.ptr) == 0  # 7+1 written, rest truncated, wraps to 0
    np.testing.assert_array_equal(np.asarray(q4.feats[7]), [0, 1, 2, 3])


def test_prototypes_update():
    q = init_queue(jax.random.PRNGKey(0), k=6, dim=4)
    q = q.replace(l_i=jnp.asarray([2, 2, 0, 0, 0, 0], jnp.int32),
                  feats=jnp.arange(24, dtype=jnp.float32).reshape(6, 4))
    old_proto5 = np.asarray(q.proto_i[5])
    q2 = update_prototypes(q)
    want_c2 = np.asarray(q.feats[:2]).mean(axis=0)
    np.testing.assert_allclose(np.asarray(q2.proto_i[2]), want_c2, rtol=1e-6)
    # class 5 has no members -> previous prototype kept
    np.testing.assert_array_equal(np.asarray(q2.proto_i[5]), old_proto5)


def test_logits_and_masks(rng):
    q = init_queue(jax.random.PRNGKey(0), k=10, dim=4)
    qq = jnp.asarray(rng.standard_normal((3, 4)), jnp.float32)
    kk = jnp.asarray(rng.standard_normal((3, 4)), jnp.float32)
    logits = moco_logits(qq, kk, q)
    assert logits.shape == (3, 11)
    np.testing.assert_allclose(np.asarray(logits[:, 0]),
                               np.sum(np.asarray(qq) * np.asarray(kk), -1),
                               rtol=1e-5)
    pl = prototype_logits(qq, q)
    assert pl["v"].shape == (3, 10)
    mask = queue_positive_mask(jnp.asarray([1, 2, 0]),
                               q.l_ivt.at[3].set(2))
    assert mask.shape == (3, 10)
    assert float(mask[1, 3]) == 1.0


def test_momentum_update():
    pq = {"w": jnp.ones(3)}
    pk = {"w": jnp.zeros(3)}
    out = momentum_update(pq, pk, m=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1, rtol=1e-6)
