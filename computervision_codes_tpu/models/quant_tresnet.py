"""Int8 post-training-quantized TResNet (inference/serving path).

Extends the ResNet PTQ machinery (models/quantized.py, ops/quant.py) to
the TResNet zoo backbone: every (conv, ABN) pair folds into per-channel
int8 weights + a dequant affine carrying the BN constants, with the ABN's
LeakyReLU as the epilogue activation (slope 1e-2 stem / 1e-3 blocks,
matching models/tresnet.py and the reference's inplace-ABN,
MT4MTLKD/Spatial_transformer/models/tresnet/tresnet_sync.py:46,153).
SE modules and blur-pool stay float (tiny VPU work). Measured per-conv
int8 gains at TResNet-M shapes: 1.1-4.0x (scripts/stem_probe.py round-3
probe); CvT was evaluated and recorded as a NEGATIVE (its patch convs
run 0.34-0.52x in int8 and the depthwise projections are a wash —
docs/BENCH.md zoo table).

Use:
    qp = quantize_tresnet(variables["params"], variables["batch_stats"])
    qp = calibrate_tresnet(qp, frames, width, layers)      # static scales
    out = quantized_tresnet_apply(qp, frames, width, layers)
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.fused_norm import blur_pool, space_to_depth
from ..ops.quant import fold_bn, quantize_weight, quantized_conv_bn
from .tresnet import VARIANTS

STEM_SLOPE = 1e-2
BLOCK_SLOPE = 1e-3


def _qconv(conv_p: Dict, abn_p: Dict, abn_s: Dict) -> Dict:
    w_q, s_w = quantize_weight(conv_p["kernel"])
    mult, bias = fold_bn(
        s_w, {"scale": abn_p["bn"]["scale"], "bias": abn_p["bn"]["bias"],
              "mean": abn_s["bn"]["mean"], "var": abn_s["bn"]["var"]})
    return {"w_q": w_q, "mult": mult, "bias": bias}


def quantize_tresnet(params: Dict, batch_stats: Dict) -> Dict:
    """Fold every (conv, ABN) pair of a TResNet tree into int8 form; SE
    Dense params are carried through in float."""
    out: Dict = {"stem": _qconv(params["stem_conv"], params["stem_abn"],
                                batch_stats["stem_abn"])}
    for name in params:
        if not name.startswith("layer"):
            continue
        blk, blk_s = params[name], batch_stats[name]
        q: Dict = {}
        for i in (1, 2, 3):
            if f"conv{i}" in blk:
                q[f"conv{i}"] = _qconv(blk[f"conv{i}"], blk[f"abn{i}"],
                                       blk_s[f"abn{i}"])
        if "downsample" in blk:
            q["downsample"] = _qconv(blk["downsample"],
                                     blk["downsample_abn"],
                                     blk_s["downsample_abn"])
        if "se" in blk:
            q["se"] = blk["se"]  # float Dense params
        out[name] = q
    return out


def _se(x, se_p, dtype):
    s = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
    s = jax.nn.relu(s @ se_p["fc1"]["kernel"] + se_p["fc1"]["bias"])
    s = jax.nn.sigmoid(s @ se_p["fc2"]["kernel"] + se_p["fc2"]["bias"])
    return (x.astype(jnp.float32) * s[:, None, None, :]).astype(dtype)


def _downsample(x, q, stride, dtype, record):
    if stride == 2:
        x = nn.avg_pool(x, (2, 2), strides=(2, 2), padding="SAME",
                        count_include_pad=False)
    return quantized_conv_bn(x, q, padding=((0, 0), (0, 0)), dtype=dtype,
                             record=record)


def _basic(x, q, stride, dtype, record):
    h = quantized_conv_bn(x, q["conv1"], padding=((1, 1), (1, 1)),
                          leaky_slope=BLOCK_SLOPE, dtype=dtype,
                          record=record)
    if stride == 2:  # anti-alias AFTER conv1 (tresnet_sync.py:65)
        h = blur_pool(h)
    h = quantized_conv_bn(h, q["conv2"], padding=((1, 1), (1, 1)),
                          dtype=dtype, record=record)
    if "se" in q:
        h = _se(h, q["se"], dtype)
    identity = _downsample(x, q["downsample"], stride, dtype, record) \
        if "downsample" in q else x
    return jax.nn.relu(h + identity)


def _bottleneck(x, q, stride, dtype, record):
    h = quantized_conv_bn(x, q["conv1"], padding=((0, 0), (0, 0)),
                          leaky_slope=BLOCK_SLOPE, dtype=dtype,
                          record=record)
    h = quantized_conv_bn(h, q["conv2"], padding=((1, 1), (1, 1)),
                          leaky_slope=BLOCK_SLOPE, dtype=dtype,
                          record=record)
    if stride == 2:  # anti-alias AFTER conv2 (tresnet_sync.py:108)
        h = blur_pool(h)
    if "se" in q:
        h = _se(h, q["se"], dtype)
    h = quantized_conv_bn(h, q["conv3"], padding=((0, 0), (0, 0)),
                          dtype=dtype, record=record)
    identity = _downsample(x, q["downsample"], stride, dtype, record) \
        if "downsample" in q else x
    return jax.nn.relu(h + identity)


def quantized_tresnet_apply(qp: Dict, x: jnp.ndarray, width: int,
                            layers: Sequence[int], dtype=jnp.bfloat16,
                            record=None) -> Dict:
    """Mirror of TResNet.__call__ (models/tresnet.py:176-195), int8 convs."""
    x = space_to_depth(x.astype(dtype), 4)
    x = quantized_conv_bn(x, qp["stem"], padding=((1, 1), (1, 1)),
                          leaky_slope=STEM_SLOPE, dtype=dtype, record=record)
    stages = []
    for si, depth in enumerate(layers):
        blk = _basic if si < 2 else _bottleneck
        for bi in range(depth):
            stride = 2 if si > 0 and bi == 0 else 1
            x = blk(x, qp[f"layer{si + 1}_{bi}"], stride, dtype, record)
        stages.append(x)
    return {"stages": stages, "pooled": jnp.mean(x, axis=(1, 2))}


def _conv_call_order(qp: Dict, layers: Sequence[int]) -> list:
    order = [qp["stem"]]
    for si, depth in enumerate(layers):
        for bi in range(depth):
            q = qp[f"layer{si + 1}_{bi}"]
            order.extend(q[f"conv{i}"] for i in (1, 2, 3)
                         if f"conv{i}" in q)
            if "downsample" in q:
                order.append(q["downsample"])
    return order


def calibrate_tresnet(qp: Dict, x: jnp.ndarray, width: int,
                      layers: Sequence[int], dtype=jnp.bfloat16,
                      margin: float = 1.0) -> Dict:
    """Bake static per-conv activation scales (see calibrate_resnet)."""
    record: list = []
    quantized_tresnet_apply(qp, x, width, layers, dtype=dtype, record=record)
    new = jax.tree.map(lambda v: v, qp)
    order = _conv_call_order(new, layers)
    assert len(order) == len(record), (len(order), len(record))
    for q, s in zip(order, record):
        q["act_scale"] = jnp.float32(s * margin)
    return new


def make_int8_tresnet(name: str, variables: Dict, calibrate_frames=None,
                      dtype=jnp.bfloat16):
    """(fn, qp) for a named variant: fn(qp, frames) -> {"pooled", "stages"}."""
    cfg = VARIANTS[name]
    qp = quantize_tresnet(variables["params"], variables["batch_stats"])
    if calibrate_frames is not None:
        qp = calibrate_tresnet(qp, jnp.asarray(calibrate_frames, dtype),
                               cfg["width"], cfg["layers"], dtype=dtype)

    def fn(qp, frames):
        return quantized_tresnet_apply(qp, frames, cfg["width"],
                                       cfg["layers"], dtype=dtype)

    return fn, qp
