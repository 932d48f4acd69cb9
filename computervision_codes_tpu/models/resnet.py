"""ResNet-18/34/50/101 backbones (torchvision-compatible architecture).

The reference builds its spatial students/teachers on torchvision ResNets
(MT4MTLKD/Spatial_cnn/network.py:95-118 with forward-hook feature taps;
Spatial_transformer/models/backbone.py:107-156 with FrozenBatchNorm).
Here the taps are explicit return values — the module returns every stage
output plus the pooled feature, no hooks.

Architecture parity notes (torchvision):
  * stem: 7x7/2 conv (64) -> BN -> ReLU -> 3x3/2 max-pool (pad 1)
  * stages: BasicBlock x2 per stage (r18), Bottleneck (r50); stride 2 on the
    first block of stages 2-4 with a 1x1 conv+BN downsample shortcut
  * BN eps 1e-5, momentum 0.1 (flax momentum = 0.9)
  * optional ``frozen_bn`` turns BatchNorm into a fixed scale/bias
    (FrozenBatchNorm2d, backbone.py:44-80) — stats and affine params are
    loaded from pretrained weights and never updated.

Layout is NHWC (TPU-native); the weight converter (models/convert.py) maps
torchvision OIHW checkpoints into these modules.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class FrozenBatchNorm(nn.Module):
    """BatchNorm with constant (non-trainable, non-updated) stats and affine."""

    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool = True):
        n = x.shape[-1]
        scale = self.variable("frozen", "scale", lambda: jnp.ones(n))
        bias = self.variable("frozen", "bias", lambda: jnp.zeros(n))
        mean = self.variable("frozen", "mean", lambda: jnp.zeros(n))
        var = self.variable("frozen", "var", lambda: jnp.ones(n))
        w = scale.value * (var.value + self.epsilon) ** -0.5
        b = bias.value - mean.value * w
        return x * w.astype(self.dtype) + b.astype(self.dtype)


def _norm(frozen: bool, dtype) -> Callable[..., nn.Module]:
    if frozen:
        return partial(FrozenBatchNorm, dtype=dtype)
    return partial(nn.BatchNorm, momentum=0.9, epsilon=1e-5, dtype=dtype)


_conv_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    frozen_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = _norm(self.frozen_bn, self.dtype)
        identity = x
        out = nn.Conv(self.filters, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, dtype=self.dtype, kernel_init=_conv_init,
                      name="conv1")(x)
        out = norm(name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                      dtype=self.dtype, kernel_init=_conv_init, name="conv2")(out)
        out = norm(name="bn2")(out, use_running_average=not train)
        if identity.shape[-1] != self.filters or self.stride != 1:
            identity = nn.Conv(self.filters, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               kernel_init=_conv_init, name="downsample_conv")(x)
            identity = norm(name="downsample_bn")(identity,
                                                  use_running_average=not train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    filters: int  # bottleneck width; output channels = filters * 4
    stride: int = 1
    frozen_bn: bool = False
    dtype: jnp.dtype = jnp.float32

    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = _norm(self.frozen_bn, self.dtype)
        out_ch = self.filters * self.expansion
        identity = x
        out = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                      kernel_init=_conv_init, name="conv1")(x)
        out = norm(name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = nn.Conv(self.filters, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, dtype=self.dtype, kernel_init=_conv_init,
                      name="conv2")(out)
        out = norm(name="bn2")(out, use_running_average=not train)
        out = nn.relu(out)
        out = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                      kernel_init=_conv_init, name="conv3")(out)
        out = norm(name="bn3")(out, use_running_average=not train)
        if identity.shape[-1] != out_ch or self.stride != 1:
            identity = nn.Conv(out_ch, (1, 1), strides=self.stride,
                               use_bias=False, dtype=self.dtype,
                               kernel_init=_conv_init, name="downsample_conv")(x)
            identity = norm(name="downsample_bn")(identity,
                                                  use_running_average=not train)
        return nn.relu(out + identity)


def _s2d_conv1(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """The torch-resnet stem conv (7x7, stride 2, pad 3) re-expressed as a
    4x4 stride-1 VALID conv over a 2x2 space-to-depth input.

    Identical multiply-adds on the SAME conv1 kernel (a trace-time weight
    remap, not new params): tap (dy, dx) maps to spatial (dy//2, dx//2)
    and input channel (dy%2, dx%2, c), so C_in goes 3 -> 12 and the
    stride folds away — the MXU sees a dense stride-1 conv instead of the
    C_in=3 stride-2 one it runs at ~40% peak (docs/BENCH.md round-3 stem
    roofline; the TResNet trick, generalized to a non-s2d-native stem).
    Requires even H, W (the serving geometry 256x448 is).
    """
    b, h, w, c = x.shape
    oc = kernel.shape[-1]
    x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    hp, wp = h + 6, w + 6
    xs = x.reshape(b, hp // 2, 2, wp // 2, 2, c)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp // 2, wp // 2, 4 * c)
    kpad = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))  # zero tap 7
    k2 = kpad.reshape(4, 2, 4, 2, c, oc).transpose(0, 2, 1, 3, 4, 5)
    k2 = k2.reshape(4, 4, 4 * c, oc)
    return jax.lax.conv_general_dilated(
        xs, k2.astype(xs.dtype), window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ResNet(nn.Module):
    """Headless ResNet returning stage feature maps + pooled feature."""

    stage_sizes: Sequence[int]
    block_cls: Any
    frozen_bn: bool = False
    s2d_stem: bool = False  # space-to-depth execution plan for conv1
    # (same params/math; serving-path A/B — see _s2d_conv1)
    fused_stem: bool = False  # EVAL-only fused conv+BN+relu+maxpool Pallas
    # kernel (ops/stem_pool) — BN folded at trace time from the running
    # stats; training keeps the standard path (BN must update)
    dtype: jnp.dtype = jnp.float32

    def _stem_bn_fold(self):
        """(w', b') with the inference BN folded into the conv kernel."""
        kernel = self.get_variable("params", "conv1")["kernel"]
        if self.frozen_bn:
            bn = dict(self.get_variable("frozen", "bn1"))
        else:
            bn = dict(self.get_variable("params", "bn1"))
            bn.update(self.get_variable("batch_stats", "bn1"))
        mult = bn["scale"] * jax.lax.rsqrt(bn["var"] + 1e-5)
        return kernel * mult, bn["bias"] - bn["mean"] * mult

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, Any]:
        norm = _norm(self.frozen_bn, self.dtype)
        x = x.astype(self.dtype)
        if (self.fused_stem and not train and not self.is_initializing()
                and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0):
            from ..ops.stem_pool import stem_pool_fused

            wf, bf = self._stem_bn_fold()
            x = stem_pool_fused(x, wf.astype(self.dtype), bf)
        else:
            if (self.s2d_stem and not self.is_initializing()
                    and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
                kernel = self.get_variable("params", "conv1")["kernel"]
                x = _s2d_conv1(x, kernel.astype(self.dtype))
            else:
                x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                            dtype=self.dtype, kernel_init=_conv_init,
                            name="conv1")(x)
            x = norm(name="bn1")(x, use_running_average=not train)
            x = nn.relu(x)
            # torch MaxPool2d(3, stride=2, padding=1); flax max_pool pads
            # with -inf internally (bit-identical to explicit -inf padding)
            x = nn.max_pool(x, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))
        stages = []
        for si, num_blocks in enumerate(self.stage_sizes):
            filters = 64 * (2 ** si)
            for bi in range(num_blocks):
                stride = 2 if si > 0 and bi == 0 else 1
                x = self.block_cls(filters=filters, stride=stride,
                                   frozen_bn=self.frozen_bn, dtype=self.dtype,
                                   name=f"layer{si + 1}_{bi}")(x, train=train)
            stages.append(x)
        pooled = jnp.mean(x, axis=(1, 2))
        return {"stages": stages, "pooled": pooled}

    @property
    def num_channels(self) -> int:
        mult = 1 if self.block_cls is BasicBlock else 4
        return 512 * mult


VARIANTS: Dict[str, Tuple[Sequence[int], Any]] = {
    "resnet18": ((2, 2, 2, 2), BasicBlock),
    "resnet34": ((3, 4, 6, 3), BasicBlock),
    "resnet50": ((3, 4, 6, 3), Bottleneck),
    "resnet101": ((3, 4, 23, 3), Bottleneck),
}


def build_resnet(name: str, frozen_bn: bool = False,
                 dtype: jnp.dtype = jnp.float32,
                 s2d_stem: bool = False,
                 fused_stem: bool = False) -> ResNet:
    if name not in VARIANTS:
        raise ValueError(f"unknown resnet variant {name!r}; one of {list(VARIANTS)}")
    sizes, block = VARIANTS[name]
    return ResNet(stage_sizes=sizes, block_cls=block, frozen_bn=frozen_bn,
                  s2d_stem=s2d_stem, fused_stem=fused_stem, dtype=dtype)


def feature_dim(name: str) -> int:
    sizes, block = VARIANTS[name]
    return 512 * (1 if block is BasicBlock else 4)
