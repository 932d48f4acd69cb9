"""Fused scale-bias-activation (InPlaceABN equivalent) + blur-pool helpers.

The reference's only native-code dependency is the ``inplace_abn`` CUDA
extension required by TResNet (tresnet_sync.py:17-19,50: fused BN +
LeakyReLU without materializing the normalized tensor) plus two
@torch.jit.script kernels (SpaceToDepth, anti-aliased DownsampleJIT blur
pool). On TPU the equivalents are:

  * ``fused_scale_bias_act`` — the inference form of ABN: one Pallas kernel
    computing leaky_relu(x * scale + bias) with the folded BN constants
    (XLA fuses this pattern too; the kernel guarantees it and is the
    building block for TResNet);
  * ``space_to_depth`` — 4x4 pixel-unshuffle stem (pure reshape/transpose);
  * ``blur_pool`` — anti-aliased stride-2 downsample with the fixed
    [1,2,1]⊗[1,2,1]/16 filter (anti_aliasing.py:22-41).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fused_scale_bias_act_reference(x, scale, bias, negative_slope=0.01):
    y = x * scale + bias
    return jnp.where(y >= 0, y, y * negative_slope)


def _fsba_kernel(x_ref, s_ref, b_ref, o_ref, *, slope: float):
    y = x_ref[...] * s_ref[...] + b_ref[...]
    o_ref[...] = jnp.where(y >= 0, y, y * slope)


@functools.partial(jax.jit, static_argnames=("negative_slope",))
def fused_scale_bias_act(x, scale, bias, negative_slope: float = 0.01):
    """leaky_relu(x * scale + bias) over (..., C), one VMEM pass."""
    shape = x.shape
    c = shape[-1]
    x2 = x.reshape(-1, c)
    out = pl.pallas_call(
        functools.partial(_fsba_kernel, slope=negative_slope),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(x2, scale[None].astype(x.dtype), bias[None].astype(x.dtype))
    return out.reshape(shape)


def space_to_depth(x: jnp.ndarray, block: int = 4) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/b, W/b, C*b*b) pixel unshuffle (TResNet stem,
    general_layers.py:54-62)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // block, w // block, c * block * block)


_BLUR = (np.array([1.0, 2.0, 1.0])[:, None] *
         np.array([1.0, 2.0, 1.0])[None, :]) / 16.0


def blur_pool(x: jnp.ndarray, stride: int = 2) -> jnp.ndarray:
    """Anti-aliased downsample: fixed 3x3 binomial blur then stride
    (TResNet DownsampleJIT, anti_aliasing.py:22-41). Depthwise conv with
    REFLECT edge padding, matching the reference's F.pad(..., 'reflect')."""
    c = x.shape[-1]
    kern = jnp.asarray(_BLUR, x.dtype)[:, :, None, None]
    kern = jnp.tile(kern, (1, 1, 1, c))  # HWIO with feature groups
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
