import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from computervision_codes_tpu.losses import (
    asymmetric_loss,
    bce_with_logits,
    component_labels,
    component_max_logits,
    distill_kl,
    kcl_loss,
    kcl_proto_loss,
    mse_feature_kd,
    supcon_ccl_loss,
    tcn_multitask_loss,
)


def test_bce_matches_torch(rng):
    x = rng.standard_normal((8, 10)).astype(np.float32)
    y = (rng.random((8, 10)) < 0.3).astype(np.float32)
    pw = rng.random(10).astype(np.float32) * 2 + 0.1
    want = torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor(pw))(
        torch.tensor(x), torch.tensor(y)).item()
    got = float(bce_with_logits(jnp.asarray(x), jnp.asarray(y), pos_weight=pw))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # no pos_weight
    want2 = torch.nn.BCEWithLogitsLoss()(torch.tensor(x), torch.tensor(y)).item()
    got2 = float(bce_with_logits(jnp.asarray(x), jnp.asarray(y)))
    np.testing.assert_allclose(got2, want2, rtol=1e-5)


def test_distill_kl_matches_torch(rng):
    # reference DistillKL (MT4MTLKD/Spatial_cnn/run.py:284-295) with the
    # sigmoid-activated teacher input used at the call site (run.py:180-182)
    T = 4.0
    s = rng.standard_normal((6, 10)).astype(np.float32)
    t_raw = rng.standard_normal((6, 10)).astype(np.float32)
    t_act = torch.sigmoid(torch.tensor(t_raw))
    p_s = F.log_softmax(torch.tensor(s) / T, dim=1)
    p_t = F.softmax(t_act / T, dim=1)
    want = (F.kl_div(p_s, p_t, reduction="sum") * (T ** 2) / s.shape[0]).item()
    got = float(distill_kl(jnp.asarray(s), jax.nn.sigmoid(jnp.asarray(t_raw)), T))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_mse_matches_torch(rng):
    a = rng.standard_normal((4, 16)).astype(np.float32)
    b = rng.standard_normal((4, 16)).astype(np.float32)
    want = torch.nn.MSELoss()(torch.tensor(a), torch.tensor(b)).item()
    np.testing.assert_allclose(
        float(mse_feature_kd(jnp.asarray(a), jnp.asarray(b))), want, rtol=1e-6)


def _torch_asl(x, y, gamma_neg, gamma_pos, clip, eps):
    # independent torch re-derivation of the ASL formula (Alibaba-MIIL ASL)
    x = torch.tensor(x)
    y = torch.tensor(y)
    xs_pos = torch.sigmoid(x)
    xs_neg = 1.0 - xs_pos
    if clip and clip > 0:
        xs_neg = (xs_neg + clip).clamp(max=1)
    loss = y * torch.log(xs_pos.clamp(min=eps))
    loss = loss + (1 - y) * torch.log(xs_neg.clamp(min=eps))
    pt = xs_pos * y + xs_neg * (1 - y)
    gamma = gamma_pos * y + gamma_neg * (1 - y)
    loss = loss * torch.pow(1 - pt, gamma)
    return loss


def test_asl_variants_match_torch(rng):
    x = rng.standard_normal((5, 7)).astype(np.float32)
    y = (rng.random((5, 7)) < 0.4).astype(np.float32)
    base = _torch_asl(x, y, 2.0, 0.0, 0.0, 1e-5)
    want_terl = (-base.sum(dim=0) / x.shape[0] * 1000).numpy()
    got_terl = np.asarray(asymmetric_loss(jnp.asarray(x), jnp.asarray(y),
                                          gamma_neg=2, gamma_pos=0, clip=0,
                                          eps=1e-5, reduction="terl"))
    np.testing.assert_allclose(got_terl, want_terl, rtol=1e-4)
    base2 = _torch_asl(x, y, 4.0, 1.0, 0.05, 1e-8)
    got_sum = float(asymmetric_loss(jnp.asarray(x), jnp.asarray(y),
                                    reduction="sum"))
    np.testing.assert_allclose(got_sum, float(-base2.sum()), rtol=1e-4)


def test_asl_gradient_matches_reference_no_grad_focal(rng):
    """The focal weight is gradient-constant (the reference runs
    disable_torch_grad_focal_loss=True, TERL run.py:531-536). Also: grads
    stay finite at SATURATED logits with gamma_pos=0 — backpropping
    through pow(1-pt, 0) is d/dx x^0 = nan at pt=1, which blew up TERL
    training the moment its sigmoids saturated."""
    import torch

    x = rng.standard_normal((4, 6)).astype(np.float32) * 3
    x[0, 0] = 40.0   # saturated positive (pt=1 exactly in fp32)
    x[1, 1] = -40.0  # saturated negative
    y = (rng.random((4, 6)) < 0.4).astype(np.float32)
    y[0, 0] = 1.0
    y[1, 1] = 0.0

    xt = torch.tensor(x, requires_grad=True)
    yt = torch.tensor(y)
    xs_pos = torch.sigmoid(xt)
    xs_neg = 1.0 - xs_pos
    loss = yt * torch.log(xs_pos.clamp(min=1e-5))
    loss = loss + (1 - yt) * torch.log(xs_neg.clamp(min=1e-5))
    with torch.no_grad():  # the reference's disable_torch_grad_focal_loss
        pt = xs_pos * yt + xs_neg * (1 - yt)
        w = torch.pow(1 - pt, 0.0 * yt + 2.0 * (1 - yt))
    ((-loss * w).sum(dim=0) / x.shape[0] * 1000).mean().backward()
    want = xt.grad.numpy()

    got = np.asarray(jax.grad(lambda lx: asymmetric_loss(
        lx, jnp.asarray(y), gamma_neg=2, gamma_pos=0, clip=0, eps=1e-5,
        reduction="mean_terl"))(jnp.asarray(x)))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-7)


def test_component_max_consistency(rng):
    from computervision_codes_tpu.data.bank import load_bank

    bank = load_bank()
    logits = jnp.asarray(rng.standard_normal((3, 100)), jnp.float32)
    comp = component_max_logits(logits)
    assert comp["i"].shape == (3, 6)
    # manual check for i-class 2
    idx = np.where(bank[:, 1] == 2)[0]
    want = np.asarray(logits)[:, idx].max(axis=1)
    np.testing.assert_allclose(np.asarray(comp["i"][:, 2]), want, rtol=1e-6)

    labels = (rng.random((3, 100)) < 0.1).astype(np.float32)
    cl = component_labels(jnp.asarray(labels))
    for f in range(3):
        for t in np.nonzero(labels[f])[0]:
            assert cl["i"][f, bank[t, 1]] == 1
            assert cl["v"][f, bank[t, 2]] == 1


def test_kcl_losses_basic(rng):
    key = jax.random.PRNGKey(0)
    B, K = 4, 12
    logits = jnp.asarray(rng.standard_normal((B, 1 + K)), jnp.float32)
    mask = jnp.asarray((rng.random((B, K)) < 0.3).astype(np.float32))
    loss = kcl_loss(key, logits, mask, k=3)
    assert np.isfinite(float(loss))
    # with k=0 the full mask is used: closed-form check against log_softmax
    lp = jax.nn.log_softmax(logits / 0.07, axis=1)
    full = jnp.concatenate([jnp.ones((B, 1)), mask], axis=1)
    want = -float(jnp.sum(jnp.sum(full * lp, 1) / jnp.sum(full, 1)) / B)
    np.testing.assert_allclose(float(kcl_loss(key, logits, mask, k=0)), want,
                               rtol=1e-5)


def test_kcl_proto_no_positives_is_zero(rng):
    key = jax.random.PRNGKey(0)
    logits = jnp.asarray(rng.standard_normal((3, 5)), jnp.float32)
    zero_mask = jnp.zeros((3, 5))
    assert float(kcl_proto_loss(key, logits, zero_mask)) == 0.0
    some = zero_mask.at[0, 1].set(1.0)
    assert np.isfinite(float(kcl_proto_loss(key, logits, some)))


def test_supcon_ccl_finite(rng):
    logits = jnp.asarray(rng.standard_normal((4, 9)), jnp.float32)
    lm = jnp.asarray((rng.random((4, 8)) < 0.4).astype(np.float32))
    cm = jnp.asarray((rng.random((4, 8)) < 0.4).astype(np.float32))
    assert np.isfinite(float(supcon_ccl_loss(logits, lm, cm)))


def test_tcn_fusion_loss(rng):
    T = 20
    levels = [jnp.asarray(rng.standard_normal((1, T, 100)), jnp.float32)
              for _ in range(4)]
    outputs = {
        "ivt": levels,
        "i": [l[..., :6] for l in levels],
        "v": [l[..., :10] for l in levels],
        "t": [l[..., :15] for l in levels],
    }
    labels = {
        "ivt": jnp.asarray((rng.random((T, 100)) < 0.05).astype(np.float32)),
        "i": jnp.asarray((rng.random((T, 6)) < 0.3).astype(np.float32)),
        "v": jnp.asarray((rng.random((T, 10)) < 0.3).astype(np.float32)),
        "t": jnp.asarray((rng.random((T, 15)) < 0.3).astype(np.float32)),
    }
    parts = tcn_multitask_loss(outputs, labels)
    want = 0.1 * (parts["i"] + parts["v"] + parts["t"]) + parts["ivt"]
    np.testing.assert_allclose(float(parts["total"]), float(want), rtol=1e-6)
    # manual level sum for ivt
    manual = sum(float(bce_with_logits(l[0], labels["ivt"])) for l in levels)
    np.testing.assert_allclose(float(parts["ivt"]), manual, rtol=1e-5)


def test_interpolate_1d_matches_torch(rng):
    """torch F.interpolate parity for the FPN upsample ('linear',
    align_corners=False) and the fusion-loss label resize ('nearest') —
    Temporal_tenco/network.py:95-96 and run.py:173-175."""
    from computervision_codes_tpu.models.common import interpolate_1d

    x = rng.standard_normal((2, 5, 13)).astype(np.float32)
    for size in (7, 13, 29, 40):
        for mode in ("linear", "nearest"):
            kwargs = {"align_corners": False} if mode == "linear" else {}
            want = F.interpolate(torch.tensor(x), size=size, mode=mode,
                                 **kwargs).numpy()
            got = np.asarray(interpolate_1d(jnp.asarray(x), size, mode))
            np.testing.assert_allclose(got, want, atol=1e-5,
                                       err_msg=f"{mode} {size}")


def test_fpn_loss_batched_and_hier_mask(rng):
    """Regression: every batch element contributes; pooled (hier) levels
    respect the frame mask (self-review findings)."""
    from computervision_codes_tpu.losses.fusion import fpn_level_loss

    T, C = 12, 5
    labels = jnp.asarray((rng.random((T, C)) < 0.3).astype(np.float32))
    lvl_b1 = jnp.asarray(rng.standard_normal((1, T, C)), jnp.float32)
    lvl_b2 = jnp.concatenate([lvl_b1, lvl_b1 + 3.0], axis=0)
    l1 = float(fpn_level_loss([lvl_b1], labels))
    l2 = float(fpn_level_loss([lvl_b2], labels))
    assert l2 != l1  # second batch element changes the loss

    # hier level (different T) with a mask: masked frames must not leak in
    pooled = jnp.asarray(rng.standard_normal((1, 5, C)), jnp.float32)
    mask_full = jnp.ones(T)
    mask_half = jnp.concatenate([jnp.ones(T // 2), jnp.zeros(T - T // 2)])
    a = float(fpn_level_loss([pooled], labels, frame_mask=mask_full))
    b = float(fpn_level_loss([pooled], labels, frame_mask=mask_half))
    assert a != b and np.isfinite(a) and np.isfinite(b)
