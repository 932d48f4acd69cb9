"""Query2Label spatial teacher (Swin/ResNet backbone + DETR-style decoder).

Re-design of the reference Q2L assembly
(MT4MTLKD/Spatial_transformer/network.py:48-204 ``Qeruy2Label`` and
``Decoder``; transformer config models/transformer.py:347-359: d_model =
backbone channels, 4 heads, FFN 8192, 1 encoder + 2 decoder layers,
post-norm, decoder self-attention REMOVED :59-76).

Structure notes mirrored from the reference:
  * ONE transformer instance is shared by all task decoders (network.py:67-73
    pass the same module) — here a single ``Q2LTransformer`` submodule is
    applied per task;
  * each task decoder owns its input_proj 1x1 conv, query embeddings and
    GroupWiseLinear head (network.py:158-161);
  * the per-task feature is AdaptiveAvgPool over the encoder memory
    (network.py:170) — the 1536-d vectors the feature bus carries;
  * the KD cross-task attention block for loss_type='all' is the same
    construct as the CNN student's (see models/spatial_cnn.py; reference
    network.py:102-124) and is reused from there.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .common import GroupWiseLinear
from .position_encoding import sine_position_embedding
from .resnet import VARIANTS as RESNET_VARIANTS, ResNet, feature_dim
from .spatial_cnn import KDCrossTaskAttention
from .swin import VARIANTS as SWIN_VARIANTS, SwinTransformer, swin_feature_dim


class MultiHeadAttention(nn.Module):
    """torch.nn.MultiheadAttention-equivalent (packed-projection layout kept
    separable for weight conversion)."""

    dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, deterministic: bool = True,
                 return_attn: bool = False):
        h = self.num_heads
        hd = self.dim // h
        b, nq, _ = q.shape
        nk = k.shape[1]
        qp = nn.Dense(self.dim, dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(self.dim, dtype=self.dtype, name="k_proj")(k)
        vp = nn.Dense(self.dim, dtype=self.dtype, name="v_proj")(v)

        def split(t, n):
            return t.reshape(b, n, h, hd).transpose(0, 2, 1, 3)

        attn = jnp.einsum("bhqd,bhkd->bhqk", split(qp, nq) * (hd ** -0.5),
                          split(kp, nk))
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, split(vp, nk))
        out = out.transpose(0, 2, 1, 3).reshape(b, nq, self.dim)
        out = nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(out)
        if return_attn:
            # torch MultiheadAttention convention: weights averaged over
            # heads, (B, nq, nk) — the reference's sim_mat surface
            # (TERL/6_baseline_learnT/models/transformer.py:285-302)
            return out, jnp.mean(attn, axis=1)
        return out


class EncoderLayer(nn.Module):
    """Post-norm DETR encoder layer (pos added to q,k only)."""

    dim: int
    num_heads: int = 4
    ffn_dim: int = 8192
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos, deterministic: bool = True):
        qk = x + pos
        attn = MultiHeadAttention(self.dim, self.num_heads, self.dropout,
                                  self.dtype, name="self_attn")(
            qk, qk, x, deterministic)
        x = x + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        ffn = nn.Dense(self.ffn_dim, dtype=self.dtype, name="linear1")(x)
        ffn = nn.relu(ffn)
        ffn = nn.Dropout(self.dropout)(ffn, deterministic=deterministic)
        ffn = nn.Dense(self.dim, dtype=self.dtype, name="linear2")(ffn)
        x = x + nn.Dropout(self.dropout)(ffn, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)


class DecoderLayer(nn.Module):
    """Post-norm DETR decoder layer with self-attention removed
    (transformer.py:59-76 deletes self_attn/norm1 for every layer)."""

    dim: int
    num_heads: int = 4
    ffn_dim: int = 8192
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, memory, pos, query_pos, deterministic: bool = True,
                 return_attn: bool = False):
        attn = MultiHeadAttention(self.dim, self.num_heads, self.dropout,
                                  self.dtype, name="cross_attn")(
            tgt + query_pos, memory + pos, memory, deterministic,
            return_attn=return_attn)
        sim = None
        if return_attn:
            attn, sim = attn
        tgt = tgt + nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(tgt)
        ffn = nn.Dense(self.ffn_dim, dtype=self.dtype, name="linear1")(tgt)
        ffn = nn.relu(ffn)
        ffn = nn.Dropout(self.dropout)(ffn, deterministic=deterministic)
        ffn = nn.Dense(self.dim, dtype=self.dtype, name="linear2")(ffn)
        tgt = tgt + nn.Dropout(self.dropout)(ffn, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(tgt)
        return (tgt, sim) if return_attn else tgt


class Q2LTransformer(nn.Module):
    """1 encoder + 2 decoder layers, shared across task decoders."""

    dim: int
    num_heads: int = 4
    ffn_dim: int = 8192
    num_encoder_layers: int = 1
    num_decoder_layers: int = 2
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos, query_embed, deterministic: bool = True,
                 return_attn: bool = False):
        # src: (B, HW, d); pos: (1, HW, d); query_embed: (K, d)
        memory = src
        for i in range(self.num_encoder_layers):
            memory = EncoderLayer(self.dim, self.num_heads, self.ffn_dim,
                                  self.dropout, self.dtype,
                                  name=f"encoder{i}")(memory, pos,
                                                      deterministic)
        b = src.shape[0]
        query = jnp.broadcast_to(query_embed[None],
                                 (b,) + query_embed.shape).astype(self.dtype)
        tgt = jnp.zeros_like(query)
        sim_mat = None
        for i in range(self.num_decoder_layers):
            last = i == self.num_decoder_layers - 1
            out = DecoderLayer(self.dim, self.num_heads, self.ffn_dim,
                               self.dropout, self.dtype,
                               name=f"decoder{i}")(tgt, memory, pos, query,
                                                   deterministic,
                                                   return_attn=(return_attn
                                                                and last))
            tgt, sim_mat = out if return_attn and last else (out, sim_mat)
        tgt = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="decoder_norm")(tgt)
        if return_attn:
            # the reference decoder threads the LAST layer's cross-attn
            # weights out as sim_mat_2
            # (TERL/6_baseline_learnT/models/transformer.py:161-178)
            return tgt, memory, sim_mat
        return tgt, memory


class Q2L(nn.Module):
    """Full Query2Label model with per-task decoders over a shared transformer."""

    backbone: str = "swin_L_384_22k"
    loss_type: str = "all"
    teacher_dim: int = 512  # KD partner dim (Res18 teachers in res2swin)
    num_tool: int = 6
    num_verb: int = 10
    num_target: int = 15
    num_triplet: int = 100
    drop_path_rate: float = 0.1
    remat: bool = False  # rematerialize Swin blocks — SwinL-384 training
    # at useful batch sizes needs it on one chip (see scripts/train_bench)
    remat_policy: str = "dots"  # "dots" GEMM-saveable | "" save-nothing
    # (models/swin.py remat_policy; default measured faster on-chip:
    # 61.7 vs 56.3 fps at SwinL-384 b=8, scripts/train_bench.py round 4)
    quant_eval: bool = False  # int8-MXU GEMMs in the Swin fused kernels
    # (PTQ, dims >= quant_min_dim) — the int8 teacher serving config
    quant_min_dim: int = 768
    fused_eval: Optional[bool] = None  # None = auto (fused Pallas kernels
    # on TPU eval); True forces them (CPU interpret — parity tests)
    fused_train: bool = False  # Pallas-forward/reference-backward Swin
    # train path (ops/swin_train) — same gradients, faster step
    s2d_embed: bool = False  # patch embed as a space-to-depth GEMM
    # (exact; un-starves the MXU's C_in — models/swin.py)
    return_sim_mat: bool = False  # also return each task decoder's final
    # cross-attention map (B, K, HW) — the reference TERL transformer
    # variant's sim_mat_2 surface (TERL/6_baseline_learnT/models/moco.py:67-77,
    # models/transformer.py:161-178); query-to-location saliency for analysis
    dtype: jnp.dtype = jnp.float32

    def _tasks(self):
        lt = self.loss_type
        out = []
        for k, n in (("i", self.num_tool), ("v", self.num_verb),
                     ("t", self.num_target)):
            if lt == k or lt == "all":
                out.append((k, n))
        if lt == "all":
            out.append(("ivt", self.num_triplet))
        return out

    @nn.compact
    def __call__(self, images, feat_i=None, feat_v=None, feat_t=None,
                 train: bool = False) -> Dict:
        det = not train
        if self.backbone in SWIN_VARIANTS:
            bb = SwinTransformer(num_classes=0,
                                 drop_path_rate=self.drop_path_rate,
                                 remat=self.remat,
                                 remat_policy=self.remat_policy,
                                 s2d_embed=self.s2d_embed,
                                 quant_eval=self.quant_eval,
                                 quant_min_dim=self.quant_min_dim,
                                 fused_eval=self.fused_eval,
                                 fused_train=self.fused_train,
                                 dtype=self.dtype, name="backbone",
                                 **SWIN_VARIANTS[self.backbone])
            fmap = bb(images, train=train)["feature_map"]
            dim = swin_feature_dim(self.backbone)
        elif self.backbone in RESNET_VARIANTS:
            sizes, block = RESNET_VARIANTS[self.backbone]
            bb = ResNet(stage_sizes=sizes, block_cls=block,
                        frozen_bn=True, dtype=self.dtype, name="backbone")
            fmap = bb(images, train=train)["stages"][-1]
            dim = feature_dim(self.backbone)
        elif self.backbone.startswith("cvt"):
            from .cvt import VARIANTS as CVT_VARIANTS, CvT

            bb = CvT(dtype=self.dtype, name="backbone",
                     **CVT_VARIANTS[self.backbone])
            fmap = bb(images, train=train)["feature_map"]
            dim = CVT_VARIANTS[self.backbone]["dims"][-1]
        elif self.backbone.startswith("tresnet"):
            from .tresnet import VARIANTS as TR_VARIANTS, TResNet

            bb = TResNet(dtype=self.dtype, name="backbone",
                         **TR_VARIANTS[self.backbone])
            fmap = bb(images, train=train)["stages"][-1]
            dim = TR_VARIANTS[self.backbone]["width"] * 8 * 4
        else:
            raise ValueError(f"unknown backbone {self.backbone!r}")

        b, h, w, _ = fmap.shape
        pos = jnp.asarray(
            sine_position_embedding(h, w, dim // 2), self.dtype
        ).reshape(1, h * w, dim)
        src = fmap.reshape(b, h * w, dim)

        transformer = Q2LTransformer(dim, dtype=self.dtype, name="transformer")
        logits: Dict[str, jnp.ndarray] = {
            "i": jnp.zeros((b, self.num_tool), self.dtype),
            "v": jnp.zeros((b, self.num_verb), self.dtype),
            "t": jnp.zeros((b, self.num_target), self.dtype),
            "ivt": jnp.zeros((b, self.num_triplet), self.dtype),
        }
        feats: Dict[str, jnp.ndarray] = {}
        sim_mats: Dict[str, jnp.ndarray] = {}
        for key, num_class in self._tasks():
            proj = nn.Dense(dim, dtype=self.dtype,
                            name=f"input_proj_{key}")(src)
            queries = self.param(f"query_embed_{key}",
                                 nn.initializers.normal(1.0),
                                 (num_class, dim))
            if self.return_sim_mat:
                hs, memory, sim_mats[key] = transformer(
                    proj, pos, queries, det, return_attn=True)
            else:
                hs, memory = transformer(proj, pos, queries, det)
            logits[key] = GroupWiseLinear(num_class, dim, dtype=self.dtype,
                                          name=f"fc_{key}")(hs)
            feats[key] = jnp.mean(memory, axis=1)  # (B, dim)

        feature = feats.get("ivt", next(iter(feats.values())))
        out = {"logits": logits, "feature": feature, "task_features": feats}
        if self.return_sim_mat:
            out["sim_mat"] = sim_mats
        if self.loss_type == "all" and feat_i is not None:
            out["kd"] = KDCrossTaskAttention(
                student_dim=dim, teacher_dim=self.teacher_dim,
                dtype=self.dtype, name="kd_attention")(
                feature, feat_i.astype(self.dtype),
                feat_v.astype(self.dtype), feat_t.astype(self.dtype))
        return out
