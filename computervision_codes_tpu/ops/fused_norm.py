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
    # compute in f32: Mosaic on v5e rejects bf16 vector comparisons
    # ("Target does not support this comparison" at arith.cmpf bf16) and
    # the affine is more accurate in f32 anyway; the store casts back
    y = (x_ref[...].astype(jnp.float32) * s_ref[...].astype(jnp.float32)
         + b_ref[...].astype(jnp.float32))
    o_ref[...] = jnp.where(y >= 0, y, y * slope).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("negative_slope",))
def fused_scale_bias_act(x, scale, bias, negative_slope: float = 0.01):
    """leaky_relu(x * scale + bias) over (..., C), row-blocked VMEM passes.

    Row blocking matters: a gridless kernel maps the WHOLE tensor into
    VMEM — at TResNet's stem size (b=32: 100352x64) that is 48.8 MiB and
    Mosaic rejects it against the 16 MiB scoped-vmem limit (caught by the
    first real-chip run, scripts/zoo_bench.py)."""
    shape = x.shape
    c = shape[-1]
    x2 = x.reshape(-1, c)
    n = x2.shape[0]
    block = min(n, max(8, (512 * 1024) // max(c, 1)))  # ~512k elems/step
    block = max(8, (block // 8) * 8)  # sublane-aligned
    np_ = ((n + block - 1) // block) * block
    if np_ != n:
        x2 = jnp.pad(x2, ((0, np_ - n), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_fsba_kernel, slope=negative_slope),
        out_shape=jax.ShapeDtypeStruct((np_, c), x.dtype),
        grid=(np_ // block,),
        in_specs=[
            pl.BlockSpec((block, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(x2, scale[None].astype(x.dtype), bias[None].astype(x.dtype))
    return out[:n].reshape(shape)


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
