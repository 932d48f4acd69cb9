"""Spatial CNN student with multi-teacher KD cross-task attention.

TPU-native re-design of the reference MT4MTLKD student
(MT4MTLKD/Spatial_cnn/network.py:13-92 ``VideoNas``):

  * ResNet backbone with explicit feature returns (no forward hooks);
  * four linear heads (i/v/t/ivt);
  * the KD cross-task attention block computes the reference's exact math
    without materializing the (B, D, D) stack (network.py:55-71): there,
    ``stus[b, c, d] = s[b, c]`` (constant along d), so the einsum collapses
    to ``attn[b, c, n] = softmax_n(s[b, c] * sum_d m_n(t_n)[b, d] / sqrt(D))``
    — a PER-CHANNEL teacher weight whose softmax sharpness scales with the
    channel value s[b, c]. We compute the teacher column-sums once (B, 3)
    and broadcast against s, then re-project the per-channel attention-scaled
    student feature with w_i/w_v/w_t into teacher space for the MSE
    feature-KD loss. Torch parity: tests/test_kd_attention.py.

Heads are always materialized (XLA prefers static structure); the driver
selects which logits participate in the loss via ``loss_type`` — matching
the reference's zero-filled placeholder logits (network.py:79-82).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from .common import Classifier
from .resnet import VARIANTS, ResNet, feature_dim


class KDCrossTaskAttention(nn.Module):
    """Cross-task attention over three teacher features (see module docstring)."""

    student_dim: int
    teacher_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, s: jnp.ndarray, feat_i: jnp.ndarray, feat_v: jnp.ndarray,
                 feat_t: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        # m_*: teacher -> student space (reference 1x1 Conv1d == Dense)
        teas = jnp.stack(
            [
                nn.Dense(self.student_dim, dtype=self.dtype, name=f"m{k}")(f)
                for k, f in (("i", feat_i), ("v", feat_v), ("t", feat_t))
            ],
            axis=-1,
        )  # (B, Ds, 3)
        # Reference einsum with stus[b,c,d] = s[b,c]: only the teacher
        # column-sums survive the d-contraction (network.py:61).
        scale = 1.0 / jnp.sqrt(jnp.asarray(self.student_dim, dtype=self.dtype))
        tea_sums = teas.sum(axis=1) * scale  # (B, 3)
        attn = nn.softmax(s[:, :, None] * tea_sums[:, None, :], axis=-1)  # (B, Ds, 3)
        out = {}
        for n, k in enumerate(("i", "v", "t")):
            out[k] = nn.Dense(self.teacher_dim, dtype=self.dtype, name=f"w{k}")(
                s * attn[:, :, n]
            )
        return out


class SpatialCNN(nn.Module):
    """Frame-level multi-task student (ResNet + 4 heads + KD attention)."""

    network: str = "resnet18"
    loss_type: str = "all"
    teacher_dim: int = 1536
    num_tool: int = 6
    num_verb: int = 10
    num_target: int = 15
    num_triplet: int = 100
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,  # (B, H, W, 3) normalized
        feat_i: Optional[jnp.ndarray] = None,  # (B, teacher_dim)
        feat_v: Optional[jnp.ndarray] = None,
        feat_t: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> Dict:
        sizes, block = VARIANTS[self.network]
        feats = ResNet(stage_sizes=sizes, block_cls=block, dtype=self.dtype,
                       name="backbone")(images, train=train)
        s = feats["pooled"]  # (B, Ds)

        logits = {
            "i": Classifier(self.num_tool, dtype=self.dtype, name="classifier_i")(s),
            "v": Classifier(self.num_verb, dtype=self.dtype, name="classifier_v")(s),
            "t": Classifier(self.num_target, dtype=self.dtype, name="classifier_t")(s),
            "ivt": Classifier(self.num_triplet, dtype=self.dtype,
                              name="classifier_ivt")(s),
        }

        out = {"logits": logits, "feature": s}
        if self.loss_type == "all" and feat_i is not None:
            kd = KDCrossTaskAttention(
                student_dim=feature_dim(self.network),
                teacher_dim=self.teacher_dim,
                dtype=self.dtype,
                name="kd_attention",
            )(s, feat_i.astype(self.dtype), feat_v.astype(self.dtype),
              feat_t.astype(self.dtype))
            out["kd"] = kd
        return out
