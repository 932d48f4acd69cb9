"""TResNet backbone (anti-aliased SE-ResNet) — TPU-native.

Re-design of the reference's vendored TResNet
(MT4MTLKD/Spatial_transformer/models/tresnet/tresnet_sync.py:139-225 +
layers/). The reference REQUIRES the external ``inplace_abn`` CUDA extension
(tresnet_sync.py:17-19) and two @torch.jit.script kernels; the TPU
equivalents live in ops/fused_norm.py:

  * InPlaceABN (fused BN + LeakyReLU)          -> fused_scale_bias_act with
    folded BN constants (ABN class below);
  * SpaceToDepthJit (general_layers.py:54-62)  -> ops.space_to_depth;
  * DownsampleJIT blur-pool (anti_aliasing.py:22-41, reflect-padded)
                                               -> ops.blur_pool.

Exact-semantics notes (torch parity: tests/test_tresnet_parity.py):
  * anti-alias blur-pool runs AFTER the stride-1 conv+ABN it replaces
    (tresnet_sync.py:65-66, 108-110), not before;
  * the residual downsample is AvgPool2d(2, ceil) then 1x1 conv + identity
    ABN (tresnet_sync.py:203-209);
  * the post-residual activation is plain ReLU (tresnet_sync.py:89, 136);
  * the stem ABN uses the conv2d_ABN DEFAULT LeakyReLU slope 1e-2
    (tresnet_sync.py:46, 153); block ABNs pass 1e-3 explicitly;
  * SE reduction: basic max(planes/4, 64), bottleneck max(planes*4/8, 64)
    applied to the conv2 output (tresnet_sync.py:72-73, 119-120);
  * the last ABN of each block is zero-gamma initialized
    (tresnet_sync.py:196-199).

Variants (tresnet_sync.py:227-260): m = width 64, layers (3,4,11,3);
l = width int(64*1.2)=76, layers (4,5,18,3); xl = width int(64*1.3)=83,
layers (4,5,24,3). Basic blocks in stages 1-2, bottlenecks in 3-4; SE on
stages 1-3.
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
    applies the same activation. ``zero_init`` mirrors the reference's
    zero-gamma init on each block's last ABN (tresnet_sync.py:196-199).
    """

    act: bool = True
    slope: float = 1e-3
    zero_init: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        scale_init = (nn.initializers.zeros if self.zero_init
                      else nn.initializers.ones)
        bn = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                          scale_init=scale_init, name="bn")
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
    """Squeeze-excitation (layers/general_layers.py:76-93)."""

    reduce: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2))
        s = nn.relu(nn.Dense(self.reduce, dtype=self.dtype, name="fc1")(s))
        s = nn.sigmoid(nn.Dense(c, dtype=self.dtype, name="fc2")(s))
        return x * s[:, None, None, :]


def _downsample(identity, out_ch, stride, train, dtype, abn_name, conv_name):
    """Residual shortcut: AvgPool2d(2, ceil_mode, exclude-pad) then 1x1
    conv + identity ABN (tresnet_sync.py:203-209)."""
    if stride == 2:
        identity = nn.avg_pool(identity, (2, 2), strides=(2, 2),
                               padding="SAME", count_include_pad=False)
    identity = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=dtype,
                       name=conv_name)(identity)
    return ABN(act=False, dtype=dtype, name=abn_name)(identity, train)


class TBasicBlock(nn.Module):
    filters: int
    stride: int = 1
    use_se: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        needs_ds = self.stride == 2 or x.shape[-1] != self.filters
        identity = x
        h = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        h = ABN(dtype=self.dtype, name="abn1")(h, train)
        if self.stride == 2:  # anti-alias AFTER conv1 (tresnet_sync.py:65)
            h = blur_pool(h)
        h = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = ABN(act=False, zero_init=True, dtype=self.dtype,
                name="abn2")(h, train)
        if self.use_se:
            h = SEModule(max(self.filters // 4, 64), self.dtype, name="se")(h)
        if needs_ds:
            identity = _downsample(identity, self.filters, self.stride, train,
                                   self.dtype, "downsample_abn", "downsample")
        return nn.relu(h + identity)


class TBottleneck(nn.Module):
    filters: int
    stride: int = 1
    use_se: bool = True
    dtype: jnp.dtype = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = self.filters * self.expansion
        needs_ds = self.stride == 2 or x.shape[-1] != out_ch
        identity = x
        h = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = ABN(dtype=self.dtype, name="abn1")(h, train)
        h = nn.Conv(self.filters, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = ABN(dtype=self.dtype, name="abn2")(h, train)
        if self.stride == 2:  # anti-alias AFTER conv2 (tresnet_sync.py:108)
            h = blur_pool(h)
        if self.use_se:  # reduce = max(planes*4//8, 64) (tresnet_sync.py:119)
            h = SEModule(max(self.filters * self.expansion // 8, 64),
                         self.dtype, name="se")(h)
        h = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(h)
        h = ABN(act=False, zero_init=True, dtype=self.dtype,
                name="abn3")(h, train)
        if needs_ds:
            identity = _downsample(identity, out_ch, self.stride, train,
                                   self.dtype, "downsample_abn", "downsample")
        return nn.relu(h + identity)


class TResNet(nn.Module):
    width: int = 64
    layers: Sequence[int] = (3, 4, 11, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict[str, Any]:
        x = space_to_depth(x.astype(self.dtype), 4)
        x = nn.Conv(self.width, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        # stem keeps conv2d_ABN's default slope 1e-2 (tresnet_sync.py:46,153)
        x = ABN(slope=1e-2, dtype=self.dtype, name="stem_abn")(x, train)
        stages = []
        for si, depth in enumerate(self.layers):
            filters = self.width * (2 ** si)
            block = TBasicBlock if si < 2 else TBottleneck
            use_se = si < 3  # SE on stages 1-3 (tresnet_sync.py:155-162)
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
