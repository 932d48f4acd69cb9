"""Torch parity for the KD cross-task attention block.

The reference block (MT4MTLKD/Spatial_cnn/network.py:55-71) stacks the
pooled student feature D times and einsums it against the three projected
teacher features, yielding a PER-CHANNEL softmax teacher weight. The torch
model below reproduces those stacked-tensor semantics literally (stack →
permute → einsum → softmax → per-task 1x1 reprojection); the flax module
computes the collapsed form. They must agree to float tolerance on shared
weights.
"""

import numpy as np
import pytest
import torch

import jax

from computervision_codes_tpu.models.spatial_cnn import KDCrossTaskAttention


def _torch_kd_reference(s, t_i, t_v, t_t, m_w, m_b, w_w, w_b):
    """Literal stacked-einsum semantics of network.py:55-71 (weights given
    as (in, out) kernels / (out,) biases to match flax Dense)."""
    D = s.shape[1]
    proj = [t @ m_w[k] + m_b[k] for k, t in (("i", t_i), ("v", t_v), ("t", t_t))]
    stus = torch.stack([s for _ in range(D)]).permute(1, 2, 0)  # (B, D, D)
    teas = torch.stack(proj).permute(1, 2, 0)                   # (B, D, 3)
    attn = torch.einsum("bcd,bdn->bcn", stus / (stus.size(-1) ** 0.5), teas)
    attn = attn.softmax(dim=-1)
    out = {}
    for n, k in enumerate(("i", "v", "t")):
        out[k] = (s * attn[:, :, n]) @ w_w[k] + w_b[k]
    return out


@pytest.mark.parametrize("student_dim,teacher_dim", [(16, 24), (48, 32)])
def test_kd_attention_matches_torch_reference(rng, student_dim, teacher_dim):
    B = 5
    s = rng.standard_normal((B, student_dim)).astype(np.float32)
    t_i = rng.standard_normal((B, teacher_dim)).astype(np.float32)
    t_v = rng.standard_normal((B, teacher_dim)).astype(np.float32)
    t_t = rng.standard_normal((B, teacher_dim)).astype(np.float32)

    mod = KDCrossTaskAttention(student_dim=student_dim, teacher_dim=teacher_dim)
    params = mod.init(jax.random.PRNGKey(0), s, t_i, t_v, t_t)
    got = mod.apply(params, s, t_i, t_v, t_t)

    p = params["params"]
    m_w = {k: torch.from_numpy(np.asarray(p[f"m{k}"]["kernel"])) for k in "ivt"}
    m_b = {k: torch.from_numpy(np.asarray(p[f"m{k}"]["bias"])) for k in "ivt"}
    w_w = {k: torch.from_numpy(np.asarray(p[f"w{k}"]["kernel"])) for k in "ivt"}
    w_b = {k: torch.from_numpy(np.asarray(p[f"w{k}"]["bias"])) for k in "ivt"}
    want = _torch_kd_reference(
        torch.from_numpy(s), torch.from_numpy(t_i), torch.from_numpy(t_v),
        torch.from_numpy(t_t), m_w, m_b, w_w, w_b)

    for k in ("i", "v", "t"):
        np.testing.assert_allclose(np.asarray(got[k]), want[k].numpy(),
                                   rtol=1e-5, atol=1e-5)


def test_attention_weights_vary_per_channel(rng):
    """Regression vs the round-1 bug: the softmax weight must depend on the
    channel value s[b, c], not collapse to one scalar per (batch, teacher)."""
    import jax.numpy as jnp
    import flax.linen as fnn

    student_dim, teacher_dim, B = 8, 6, 2
    s = rng.standard_normal((B, student_dim)).astype(np.float32)
    feats = [rng.standard_normal((B, teacher_dim)).astype(np.float32)
             for _ in range(3)]
    mod = KDCrossTaskAttention(student_dim=student_dim, teacher_dim=teacher_dim)
    params = mod.init(jax.random.PRNGKey(1), s, *feats)

    # recompute the internal attention exactly as the module does
    p = params["params"]
    teas = jnp.stack([feats[n] @ p[f"m{k}"]["kernel"] + p[f"m{k}"]["bias"]
                      for n, k in enumerate("ivt")], axis=-1)
    tea_sums = teas.sum(axis=1) / np.sqrt(student_dim)
    attn = fnn.softmax(s[:, :, None] * tea_sums[:, None, :], axis=-1)
    # different channels -> different teacher weights (per-channel softmax)
    assert np.ptp(np.asarray(attn[0, :, 0])) > 1e-4
