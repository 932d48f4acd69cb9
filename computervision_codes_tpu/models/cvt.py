"""CvT (Convolutional vision Transformer) backbone — TPU-native.

Re-design of the reference's vendored CvT
(MT4MTLKD/Spatial_transformer/models/cls_cvt/cls_cvt.py:494-645, selected by
backbone='CvT_w24', yaml configs models/cls_cvt/cvt-w24-384x384.yaml).
Three stages of overlapping conv embedding + transformer blocks whose
q/k/v projections are depthwise convolutions (k/v strided 2), cls token in
the final stage only.

Variant 'cvt_w24' mirrors the w24 yaml: dims (192, 768, 1024), depths
(2, 2, 20), heads (3, 12, 16). A 'cvt_nano' exists for smoke tests.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import multi_head_attention
from .common import Mlp, trunc_normal_init

VARIANTS = {
    "cvt_w24": dict(dims=(192, 768, 1024), depths=(2, 2, 20),
                    heads=(3, 12, 16)),
    "cvt_13": dict(dims=(64, 192, 384), depths=(1, 2, 10), heads=(1, 3, 6)),
    "cvt_nano": dict(dims=(16, 32, 64), depths=(1, 1, 2), heads=(1, 2, 4)),
}


class ConvProjection(nn.Module):
    """Depthwise-conv token projection (cls_cvt conv_proj_{q,k,v})."""

    dim: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, H, W, C)
        x = nn.Conv(self.dim, (3, 3), strides=self.stride, padding=1,
                    feature_group_count=self.dim, use_bias=False,
                    dtype=self.dtype, name="dw")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return x


class CvTAttention(nn.Module):
    dim: int
    num_heads: int
    kv_stride: int = 2
    with_cls: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cls=None):
        b, h, w, c = x.shape
        nh = self.num_heads
        hd = c // nh
        q_map = ConvProjection(c, 1, self.dtype, name="proj_q")(x)
        k_map = ConvProjection(c, self.kv_stride, self.dtype, name="proj_k")(x)
        v_map = ConvProjection(c, self.kv_stride, self.dtype, name="proj_v")(x)

        def tok(m, extra=None):
            t = m.reshape(b, -1, c)
            if extra is not None:
                t = jnp.concatenate([extra, t], axis=1)
            return t

        q = tok(q_map, cls)
        k = tok(k_map, cls)
        v = tok(v_map, cls)
        q = nn.Dense(c, dtype=self.dtype, name="q")(q)
        k = nn.Dense(c, dtype=self.dtype, name="k")(k)
        v = nn.Dense(c, dtype=self.dtype, name="v")(v)

        def heads(t):
            return t.reshape(b, t.shape[1], nh, hd).transpose(0, 2, 1, 3)

        out = multi_head_attention(heads(q), heads(k), heads(v), backend="xla")
        out = out.transpose(0, 2, 1, 3).reshape(b, q.shape[1], c)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        if cls is not None:
            return out[:, 1:].reshape(b, h, w, c), out[:, :1]
        return out.reshape(b, h, w, c), None


class CvTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    with_cls: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cls=None, deterministic: bool = True):
        b, h, w, c = x.shape
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")
        xa, ca = CvTAttention(self.dim, self.num_heads,
                              with_cls=self.with_cls, dtype=self.dtype,
                              name="attn")(
            norm1(x), norm1(cls) if cls is not None else None)
        x = x + xa
        if cls is not None:
            cls = cls + ca
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")
        mlp = Mlp(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp")
        x = x + mlp(norm2(x), deterministic)
        if cls is not None:
            cls = cls + mlp(norm2(cls), deterministic)
        return x, cls


class CvT(nn.Module):
    dims: Sequence[int] = (192, 768, 1024)
    depths: Sequence[int] = (2, 2, 20)
    heads: Sequence[int] = (3, 12, 16)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> Dict:
        det = not train
        x = images.astype(self.dtype)
        cls = None
        for si, (dim, depth, nh) in enumerate(
                zip(self.dims, self.depths, self.heads)):
            k, s = (7, 4) if si == 0 else (3, 2)
            x = nn.Conv(dim, (k, k), strides=s, padding=k // 2,
                        dtype=self.dtype, name=f"embed{si}")(x)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"embed_norm{si}")(x)
            last = si == len(self.dims) - 1
            if last:
                cls = self.param("cls_token", trunc_normal_init(),
                                 (1, 1, dim)).astype(self.dtype)
                cls = jnp.broadcast_to(cls, (x.shape[0], 1, dim))
            for bi in range(depth):
                x, cls = CvTBlock(dim, nh, with_cls=last, dtype=self.dtype,
                                  name=f"stage{si}_block{bi}")(
                    x, cls, deterministic=det)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        pooled = cls[:, 0] if cls is not None else jnp.mean(x, axis=(1, 2))
        return {"feature_map": x, "pooled": pooled}


def build_cvt(name: str, dtype=jnp.float32) -> CvT:
    if name not in VARIANTS:
        raise ValueError(f"unknown cvt variant {name!r}")
    return CvT(dtype=dtype, **VARIANTS[name])
