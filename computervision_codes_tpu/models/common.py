"""Shared model building blocks (Flax, TPU-first conventions).

Conventions used across all models:
  * images are NHWC, sequences are (B, T, D) — channels-last so XLA tiles the
    contraction dimensions onto the MXU without transposes;
  * every module takes ``dtype`` (compute dtype, bfloat16 on TPU) and keeps
    parameters in float32 (``param_dtype``);
  * dropout takes an explicit ``deterministic`` flag and the 'dropout' rng.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def trunc_normal_init(stddev: float = 0.02):
    """timm-style truncated-normal init (used throughout MS-TCT/Swin)."""
    return nn.initializers.truncated_normal(stddev=stddev, lower=-2.0, upper=2.0)


def torch_linear_init(fan_in: int):
    """PyTorch nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)
    return nn.initializers.uniform(scale=2 * bound)  # shifted below


def uniform_symmetric(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class Classifier(nn.Module):
    """Single linear head over a flat feature (reference
    MT4MTLKD/Spatial_cnn/network.py:121-129 ``Classifier``)."""

    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.reshape((x.shape[0], -1))
        return nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)


class GroupWiseLinear(nn.Module):
    """Per-class linear readout: out[b,k] = <W[k], x[b,k]> + b[k].

    Reference: MT4MTLKD/Spatial_transformer/network.py:20-45. Init matches the
    reference's U(-1/sqrt(d), 1/sqrt(d)).
    """

    num_class: int
    hidden_dim: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # x: (B, K, D)
        stdv = 1.0 / math.sqrt(self.hidden_dim)
        w = self.param("W", uniform_symmetric(stdv), (self.num_class, self.hidden_dim))
        out = jnp.sum(w.astype(self.dtype) * x, axis=-1)
        if self.use_bias:
            b = self.param("b", uniform_symmetric(stdv), (self.num_class,))
            out = out + b.astype(self.dtype)
        return out


def quick_gelu(x):
    """x * sigmoid(1.702 x) — the CLIP-style activation the reference's CvT
    uses (cls_cvt.py:50-52 QuickGELU via get_cls_model act_layer)."""
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_exact(x):
    """Exact (erf) GELU — torch nn.GELU default, needed for weight-port
    parity with Swin/MS-TCT checkpoints (flax's default is tanh-approx)."""
    return nn.gelu(x, approximate=False)


class Mlp(nn.Module):
    """Transformer MLP block (dense -> act -> drop -> dense -> drop)."""

    hidden_dim: int
    out_dim: Optional[int] = None
    dropout: float = 0.0
    act: Callable = gelu_exact
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     kernel_init=trunc_normal_init())(x)
        x = self.act(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(out_dim, dtype=self.dtype, kernel_init=trunc_normal_init())(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class DropPath(nn.Module):
    """Stochastic depth — drops the whole residual branch per sample."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, p=keep, shape=shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


def interpolate_1d(x: jnp.ndarray, size: int, mode: str = "linear") -> jnp.ndarray:
    """torch.nn.functional.interpolate parity for (B, C, T) tensors.

    * ``linear`` matches align_corners=False (half-pixel centers).
    * ``nearest`` matches torch's asymmetric floor rule
      (src = floor(dst * T_in / T_out)) — NOT round-half-even.

    Used by the TCN FPN upsample (Temporal_tenco/network.py:95-96), the
    fusion loss resizing (Temporal_tenco/run.py:159-179, mode='nearest') and
    the MS-TCT Temporal_Mixer (MSTCT/TS_Mixer.py:18-25, mode='linear').
    """
    b, c, t_in = x.shape
    if t_in == size:
        return x
    if mode == "nearest":
        idx = jnp.floor(jnp.arange(size) * (t_in / size)).astype(jnp.int32)
        idx = jnp.clip(idx, 0, t_in - 1)
        return x[:, :, idx]
    if mode == "linear":
        # half-pixel centers: src = (dst + 0.5) * scale - 0.5
        scale = t_in / size
        src = (jnp.arange(size) + 0.5) * scale - 0.5
        src = jnp.clip(src, 0.0, t_in - 1)
        lo = jnp.floor(src).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, t_in - 1)
        w = (src - lo).astype(x.dtype)
        return x[:, :, lo] * (1 - w) + x[:, :, hi] * w
    raise ValueError(f"unsupported mode {mode!r}")


def adaptive_avg_pool_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    """AdaptiveAvgPool2d(1) for NHWC: (B, H, W, C) -> (B, C)."""
    return jnp.mean(x, axis=(1, 2))


def sequence_dims(shapes: Sequence[int]) -> int:
    out = 1
    for s in shapes:
        out *= s
    return out
