"""CvT (Convolutional vision Transformer) backbone — TPU-native.

Re-design of the reference's vendored CvT
(MT4MTLKD/Spatial_transformer/models/cls_cvt/cls_cvt.py:494-645, selected by
backbone='CvT_w24', yaml configs models/cls_cvt/cvt-w24-384x384.yaml).
Three stages of overlapping conv embedding + transformer blocks whose
q/k/v projections are depthwise conv + BatchNorm (k/v strided 2), cls token
in the final stage only. Exact-semantics notes:

  * attention scores are scaled by ``dim ** -0.5`` — the FULL stage dim,
    not head_dim (cls_cvt.py:102 ``self.scale = dim_out ** -0.5``);
  * the MLP activation is QuickGELU (cls_cvt.py:653 passes it as
    act_layer), not exact GELU;
  * stochastic depth ramps linearly over the last stage's blocks
    (cls_cvt.py:419, w24 yaml DROP_PATH_RATE [0, 0, 0.3]) and drops the
    cls and spatial tokens with ONE per-sample mask;
  * Q2L usage sets ``cls_token=False`` post-hoc (Spatial_transformer/
    models/backbone.py:214), so ``feature_map`` is the final-norm'd
    spatial map while ``pooled`` is the final-norm'd cls token — the same
    LayerNorm module serves both, as in the reference's single self.norm.

HF-transformers CvtModel shares this math except the activation; weight
conversion lives in models/convert.py:convert_cvt, forward parity in
tests/test_cvt_parity.py.

Variant 'cvt_w24' mirrors the w24 yaml: dims (192, 768, 1024), depths
(2, 2, 20), heads (3, 12, 16). A 'cvt_nano' exists for smoke tests.
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import multi_head_attention
from .common import Mlp, quick_gelu, trunc_normal_init

VARIANTS = {
    "cvt_w24": dict(dims=(192, 768, 1024), depths=(2, 2, 20),
                    heads=(3, 12, 16), drop_path=(0.0, 0.0, 0.3)),
    "cvt_13": dict(dims=(64, 192, 384), depths=(1, 2, 10), heads=(1, 3, 6),
                   drop_path=(0.0, 0.0, 0.1)),
    "cvt_nano": dict(dims=(16, 32, 64), depths=(1, 1, 2), heads=(1, 2, 4),
                     drop_path=(0.0, 0.0, 0.0)),
}


class ConvProjection(nn.Module):
    """Depthwise conv + BatchNorm token projection (cls_cvt.py:135-146
    ``_build_projection`` method='dw_bn': bias-free depthwise 3x3 then
    nn.BatchNorm2d)."""

    dim: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):  # (B, H, W, C)
        x = nn.Conv(self.dim, (3, 3), strides=self.stride, padding=1,
                    feature_group_count=self.dim, use_bias=False,
                    dtype=self.dtype, name="dw")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return x


class DropPathPair(nn.Module):
    """Stochastic depth over a (spatial, cls) residual pair with ONE
    per-sample mask — the reference drops the concatenated token sequence
    (cls_cvt.py:332-333), so cls and spatial tokens live or die together."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, cls=None, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x, cls
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, p=keep, shape=(x.shape[0],))
        mx = mask.reshape((-1,) + (1,) * (x.ndim - 1))
        x = jnp.where(mx, x / keep, jnp.zeros_like(x))
        if cls is not None:
            mc = mask.reshape((-1,) + (1,) * (cls.ndim - 1))
            cls = jnp.where(mc, cls / keep, jnp.zeros_like(cls))
        return x, cls


class CvTAttention(nn.Module):
    dim: int
    num_heads: int
    kv_stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cls=None, train: bool = False):
        b, h, w, c = x.shape
        nh = self.num_heads
        hd = c // nh
        q_map = ConvProjection(c, 1, self.dtype, name="proj_q")(x, train)
        k_map = ConvProjection(c, self.kv_stride, self.dtype,
                               name="proj_k")(x, train)
        v_map = ConvProjection(c, self.kv_stride, self.dtype,
                               name="proj_v")(x, train)

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

        # The kernel scales by head_dim**-0.5; the reference uses the full
        # dim**-0.5 (cls_cvt.py:102). Folding nh**-0.5 into q gives the net
        # (head_dim * nh)**-0.5 = dim**-0.5 exactly.
        qh = heads(q) * jnp.asarray(nh, self.dtype) ** -0.5
        out = multi_head_attention(qh, heads(k), heads(v), backend="xla")
        out = out.transpose(0, 2, 1, 3).reshape(b, q.shape[1], c)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        if cls is not None:
            return out[:, 1:].reshape(b, h, w, c), out[:, :1]
        return out.reshape(b, h, w, c), None


class CvTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    act: Callable = quick_gelu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cls=None, train: bool = False):
        det = not train
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")
        xa, ca = CvTAttention(self.dim, self.num_heads, dtype=self.dtype,
                              name="attn")(
            norm1(x), norm1(cls) if cls is not None else None, train)
        dp1 = DropPathPair(self.drop_path, name="drop_path1")
        xa, ca = dp1(xa, ca, deterministic=det)
        x = x + xa
        if cls is not None:
            cls = cls + ca
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")
        mlp = Mlp(int(self.dim * self.mlp_ratio), act=self.act,
                  dtype=self.dtype, name="mlp")
        dp2 = DropPathPair(self.drop_path, name="drop_path2")
        xm = mlp(norm2(x), det)
        cm = mlp(norm2(cls), det) if cls is not None else None
        xm, cm = dp2(xm, cm, deterministic=det)
        x = x + xm
        if cls is not None:
            cls = cls + cm
        return x, cls


class CvT(nn.Module):
    dims: Sequence[int] = (192, 768, 1024)
    depths: Sequence[int] = (2, 2, 20)
    heads: Sequence[int] = (3, 12, 16)
    drop_path: Sequence[float] = (0.0, 0.0, 0.3)
    act: Callable = quick_gelu
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> Dict:
        x = images.astype(self.dtype)
        cls = None
        for si, (dim, depth, nh) in enumerate(
                zip(self.dims, self.depths, self.heads)):
            # w24 yaml PATCH_SIZE/STRIDE/PADDING: (7,4,2) then (3,2,1)
            k, s, p = (7, 4, 2) if si == 0 else (3, 2, 1)
            x = nn.Conv(dim, (k, k), strides=s, padding=p,
                        dtype=self.dtype, name=f"embed{si}")(x)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name=f"embed_norm{si}")(x)
            last = si == len(self.dims) - 1
            if last:
                cls = self.param("cls_token", trunc_normal_init(),
                                 (1, 1, dim)).astype(self.dtype)
                cls = jnp.broadcast_to(cls, (x.shape[0], 1, dim))
            # stochastic-depth decay over the stage (cls_cvt.py:419)
            dpr = np.linspace(0.0, self.drop_path[si], depth)
            for bi in range(depth):
                x, cls = CvTBlock(dim, nh, drop_path=float(dpr[bi]),
                                  act=self.act, dtype=self.dtype,
                                  name=f"stage{si}_block{bi}")(
                    x, cls, train=train)
        norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")
        fm = norm(x)
        pooled = (norm(cls)[:, 0] if cls is not None
                  else jnp.mean(fm, axis=(1, 2)))
        return {"feature_map": fm, "pooled": pooled,
                "pre_norm_map": x, "pre_norm_cls": cls}


def build_cvt(name: str, dtype=jnp.float32) -> CvT:
    if name not in VARIANTS:
        raise ValueError(f"unknown cvt variant {name!r}")
    return CvT(dtype=dtype, **VARIANTS[name])
