"""TResNet backbone (anti-aliased SE-ResNet) — TPU-native.

Re-design of the reference's vendored TResNet
(MT4MTLKD/Spatial_transformer/models/tresnet/tresnet_sync.py:139-225 +
layers/). The reference REQUIRES the external ``inplace_abn`` CUDA extension
(tresnet_sync.py:17-19) and two @torch.jit.script kernels; the TPU
equivalents live in ops/fused_norm.py:

  * InPlaceABN (fused BN + LeakyReLU(1e-3))  -> fused_scale_bias_act with
    folded BN constants (ABN class below);
  * SpaceToDepthJit (general_layers.py:54-62) -> ops.space_to_depth;
  * DownsampleJIT blur-pool (anti_aliasing.py:22-41) -> ops.blur_pool.

Variants (tresnet_sync.py): m = width 64, layers (3,4,11,3);
l = width 76.8, layers (4,5,18,3); xl = width 83.2, layers (4,5,24,3).
Basic blocks in stages 1-2 (SE on), bottlenecks in stages 3-4 (SE on 3).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.fused_norm import blur_pool, fused_scale_bias_act, space_to_depth

VARIANTS = {
    "tresnet_m": dict(width=64, layers=(3, 4, 11, 3)),
    "tresnet_l": dict(width=76, layers=(4, 5, 18, 3)),
    "tresnet_xl": dict(width=83, layers=(4, 5, 24, 3)),
}


class ABN(nn.Module):
    """Inference-form InPlaceABN: BN folded into scale/bias + LeakyReLU.

    Running stats live in 'batch_stats' like regular BN so converted
    checkpoints slot in; training updates them through nn.BatchNorm and
    applies the same activation.
    """

    act: bool = True
    slope: float = 1e-3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                          name="bn")
        y = bn(x, use_running_average=not train)
        if not self.act:
            return y
        if train:
            return nn.leaky_relu(y, self.slope)
        # eval: the whole BN+act is one fused scale-bias-act Pallas pass
        scope = self.scope  # fold BN constants
        p = scope.get_variable("params", "bn")
        s = scope.get_variable("batch_stats", "bn")
        w = p["scale"] * (s["var"] + 1e-5) ** -0.5
        b = p["bias"] - s["mean"] * w
        return fused_scale_bias_act(x, w.astype(x.dtype), b.astype(x.dtype),
                                    self.slope)


class SEModule(nn.Module):
    """Squeeze-excitation (layers/general_layers.py:76)."""

    reduce: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2))
        s = nn.relu(nn.Dense(self.reduce, dtype=self.dtype, name="fc1")(s))
        s = nn.sigmoid(nn.Dense(c, dtype=self.dtype, name="fc2")(s))
        return x * s[:, None, None, :]


class TBasicBlock(nn.Module):
    filters: int
    stride: int = 1
    use_se: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        h = x
        if self.stride == 2:
            h = blur_pool(h)
        h = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(h)
        h = ABN(dtype=self.dtype, name="abn1")(h, train)
        h = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = ABN(act=False, dtype=self.dtype, name="abn2")(h, train)
        if self.use_se:
            h = SEModule(max(self.filters // 4, 64), self.dtype, name="se")(h)
        if self.stride == 2 or identity.shape[-1] != self.filters:
            identity = blur_pool(identity) if self.stride == 2 else identity
            identity = nn.Conv(self.filters, (1, 1), use_bias=False,
                               dtype=self.dtype, name="downsample")(identity)
            identity = ABN(act=False, dtype=self.dtype,
                           name="downsample_abn")(identity, train)
        return nn.leaky_relu(h + identity, 1e-3)


class TBottleneck(nn.Module):
    filters: int
    stride: int = 1
    use_se: bool = True
    dtype: jnp.dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.filters * self.expansion
        identity = x
        h = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = ABN(dtype=self.dtype, name="abn1")(h, train)
        if self.stride == 2:
            h = blur_pool(h)
        h = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = ABN(dtype=self.dtype, name="abn2")(h, train)
        if self.use_se:
            h = SEModule(max(self.filters // 8, 64), self.dtype, name="se")(h)
        h = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = ABN(act=False, dtype=self.dtype, name="abn3")(h, train)
        if self.stride == 2 or identity.shape[-1] != out_ch:
            identity = blur_pool(identity) if self.stride == 2 else identity
            identity = nn.Conv(out_ch, (1, 1), use_bias=False,
                               dtype=self.dtype, name="downsample")(identity)
            identity = ABN(act=False, dtype=self.dtype,
                           name="downsample_abn")(identity, train)
        return nn.leaky_relu(h + identity, 1e-3)


class TResNet(nn.Module):
    width: int = 64
    layers: Sequence[int] = (3, 4, 11, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, Any]:
        x = space_to_depth(x.astype(self.dtype), 4)
        x = nn.Conv(self.width, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = ABN(dtype=self.dtype, name="stem_abn")(x, train)
        stages = []
        for si, depth in enumerate(self.layers):
            filters = self.width * (2 ** si)
            block = TBasicBlock if si < 2 else TBottleneck
            use_se = si < 3  # SE on stages 1-3 (tresnet_sync.py)
            for bi in range(depth):
                stride = 2 if si > 0 and bi == 0 else 1
                x = block(filters=filters, stride=stride, use_se=use_se,
                          dtype=self.dtype,
                          name=f"layer{si + 1}_{bi}")(x, train)
            stages.append(x)
        pooled = jnp.mean(x, axis=(1, 2))
        return {"stages": stages, "pooled": pooled}


def build_tresnet(name: str, dtype=jnp.float32) -> TResNet:
    if name not in VARIANTS:
        raise ValueError(f"unknown tresnet variant {name!r}")
    return TResNet(dtype=dtype, **VARIANTS[name])
