"""Int8 post-training-quantized ResNet student (inference/serving path).

Converts a trained float ResNet (models/resnet.py params + batch_stats)
into per-channel int8 conv weights with BatchNorm folded into the dequant
affine (ops/quant.py), and provides a pure functional forward that mirrors
ResNet.__call__ layer by layer — every conv runs int8 x int8 -> int32 on
the MXU's double-rate path, epilogues (dequant + BN + relu) fuse in XLA.

The reference serves its student in fp32/fp16 torch (SURVEY §6); this is a
TPU-native serving extension, accuracy-guarded by tests
(tests/test_quantized.py: random-weight parity + trained-model mAP
preservation on synthetic data).

Use:
    qp = quantize_resnet(variables["params"], variables["batch_stats"])
    pooled = quantized_resnet_apply(qp, frames, stage_sizes, block="basic")
or end-to-end (backbone int8 + TCN bf16, one jittable program):
    fn = make_int8_e2e(model, variables)   # (clips) -> {"ivt": ...}
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.quant import fold_bn, quantize_weight, quantized_conv_bn
from .resnet import VARIANTS, BasicBlock


def _qconv(conv_p: Dict, bn_p: Dict, bn_s: Dict, eps: float = 1e-5,
           quant: bool = True) -> Dict:
    bn = {"scale": bn_p["scale"], "bias": bn_p["bias"],
          "mean": bn_s["mean"], "var": bn_s["var"]}
    if not quant:
        # BN folded into FLOAT weights (the stem config — int8 is slower
        # there, see ops/quant.quantized_conv_bn)
        mult, bias = fold_bn(jnp.ones_like(bn_p["scale"]), bn, eps)
        return {"w": conv_p["kernel"] * mult, "bias": bias}
    w_q, s_w = quantize_weight(conv_p["kernel"])
    mult, bias = fold_bn(s_w, bn, eps)
    return {"w_q": w_q, "mult": mult, "bias": bias}


def quantize_resnet(params: Dict, batch_stats: Dict,
                    float_stem: bool = True) -> Dict:
    """Fold every (conv, bn) pair of a ResNet param tree into int8 form.

    Works for BasicBlock and Bottleneck trees: walks `conv1/bn1`,
    `layer{s}_{b}` with conv1..3/bn1..3 and downsample_{conv,bn}.
    ``float_stem`` keeps the 7x7 stem as a BN-folded bf16 conv — int8 is
    measurably SLOWER at its K=147, C_in=3 geometry (docs/BENCH.md stem
    roofline) and skipping it removes the biggest PTQ noise source.
    """
    out: Dict = {"conv1": _qconv(params["conv1"], params["bn1"],
                                 batch_stats["bn1"],
                                 quant=not float_stem)}
    for name in params:
        if not name.startswith("layer"):
            continue
        blk, blk_s = params[name], batch_stats[name]
        q: Dict = {}
        for i in (1, 2, 3):
            if f"conv{i}" in blk:
                q[f"conv{i}"] = _qconv(blk[f"conv{i}"], blk[f"bn{i}"],
                                       blk_s[f"bn{i}"])
        if "downsample_conv" in blk:
            q["downsample"] = _qconv(blk["downsample_conv"],
                                     blk["downsample_bn"],
                                     blk_s["downsample_bn"])
        out[name] = q
    return out


def _basic_block(x, q: Dict, stride: int, dtype, record):
    out = quantized_conv_bn(x, q["conv1"], stride=stride,
                            padding=((1, 1), (1, 1)), relu=True, dtype=dtype,
                            record=record)
    out = quantized_conv_bn(out, q["conv2"], padding=((1, 1), (1, 1)),
                            dtype=dtype, record=record)
    if "downsample" in q:
        identity = quantized_conv_bn(x, q["downsample"], stride=stride,
                                     padding=((0, 0), (0, 0)), dtype=dtype,
                                     record=record)
    else:
        identity = x
    return jax.nn.relu(out + identity)


def _bottleneck_block(x, q: Dict, stride: int, dtype, record):
    out = quantized_conv_bn(x, q["conv1"], padding=((0, 0), (0, 0)),
                            relu=True, dtype=dtype, record=record)
    out = quantized_conv_bn(out, q["conv2"], stride=stride,
                            padding=((1, 1), (1, 1)), relu=True, dtype=dtype,
                            record=record)
    out = quantized_conv_bn(out, q["conv3"], padding=((0, 0), (0, 0)),
                            dtype=dtype, record=record)
    if "downsample" in q:
        identity = quantized_conv_bn(x, q["downsample"], stride=stride,
                                     padding=((0, 0), (0, 0)), dtype=dtype,
                                     record=record)
    else:
        identity = x
    return jax.nn.relu(out + identity)


def quantized_resnet_apply(qp: Dict, x: jnp.ndarray,
                           stage_sizes: Sequence[int],
                           block: str = "basic",
                           dtype=jnp.bfloat16, record=None,
                           s2d_stem: bool = False,
                           fused_stem: bool = False) -> Dict:
    """Mirror of ResNet.__call__ (models/resnet.py:128-148), int8 convs.

    Stem execution plans (both float-stem-config only, exact math):
    ``s2d_stem`` re-expresses conv1 via space-to-depth
    (models/resnet._s2d_conv1 — denser MXU geometry, XLA conv);
    ``fused_stem`` runs conv1 + bias + relu + maxpool as ONE Pallas
    kernel (ops/stem_pool — in-VMEM im2col, the conv output never
    touches HBM; needs H, W divisible by 4). ``fused_stem`` wins the
    precedence when both are set.
    """
    blk = _basic_block if block == "basic" else _bottleneck_block
    if (fused_stem and "w" in qp["conv1"]
            and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0):
        from ..ops.stem_pool import stem_pool_fused

        x = stem_pool_fused(x.astype(dtype), qp["conv1"]["w"].astype(dtype),
                            qp["conv1"]["bias"])
    else:
        if (s2d_stem and "w" in qp["conv1"]
                and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
            from .resnet import _s2d_conv1

            x = _s2d_conv1(x.astype(dtype), qp["conv1"]["w"].astype(dtype))
            x = jax.nn.relu(x + qp["conv1"]["bias"].astype(dtype))
        else:
            x = quantized_conv_bn(x.astype(dtype), qp["conv1"], stride=2,
                                  padding=((3, 3), (3, 3)), relu=True,
                                  dtype=dtype, record=record)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    stages = []
    for si, num_blocks in enumerate(stage_sizes):
        for bi in range(num_blocks):
            stride = 2 if si > 0 and bi == 0 else 1
            x = blk(x, qp[f"layer{si + 1}_{bi}"], stride, dtype, record)
        stages.append(x)
    return {"stages": stages, "pooled": jnp.mean(x, axis=(1, 2))}


def _conv_call_order(qp: Dict, stage_sizes: Sequence[int],
                     block: str) -> list:
    """The INT8 qconv dicts in the exact order quantized_resnet_apply
    hits them (float-stem dicts record no activation scale)."""
    order = [qp["conv1"]] if "w_q" in qp["conv1"] else []
    for si, num_blocks in enumerate(stage_sizes):
        for bi in range(num_blocks):
            q = qp[f"layer{si + 1}_{bi}"]
            order.extend([q["conv1"], q["conv2"]])
            if block != "basic":
                order.append(q["conv3"])
            if "downsample" in q:
                order.append(q["downsample"])
    return order


def calibrate_resnet(qp: Dict, x: jnp.ndarray, stage_sizes: Sequence[int],
                     block: str = "basic", dtype=jnp.bfloat16,
                     margin: float = 1.0) -> Dict:
    """Bake static per-layer activation scales from a calibration batch.

    Runs ONE eager forward recording each conv's dynamic absmax scale, then
    returns a new tree whose qconv dicts carry "act_scale" — the static
    scale lets XLA fuse the quantize step into the previous epilogue
    instead of materializing an extra full-tensor pass (measured: dynamic
    scales are a complete wash e2e, scripts/int8_e2e_bench.py). ``margin``
    scales the recorded absmax (>1 guards unseen outliers at the cost of
    resolution; saturating clip keeps errors bounded either way).
    """
    record: list = []
    quantized_resnet_apply(qp, x, stage_sizes, block=block, dtype=dtype,
                           record=record)
    new = jax.tree.map(lambda v: v, qp)  # shallow-safe structural copy
    order = _conv_call_order(new, stage_sizes, block)
    assert len(order) == len(record), (len(order), len(record))
    for q, s in zip(order, record):
        q["act_scale"] = jnp.float32(s * margin)
    return new


def make_int8_e2e(model, variables, calibrate_clips=None,
                  s2d_stem: bool = False, fused_stem: bool = False):
    """Int8 variant of EndToEndRecognizer: int8 backbone + bf16 TCN.

    ``model`` is the float EndToEndRecognizer, ``variables`` its trained
    variables. Returns (fn, qvars): fn(qvars, clips) -> logits dict,
    jittable; qvars carries the quantized backbone + float TCN params.

    ``calibrate_clips`` (B, T, H, W, 3): when given, one eager forward
    bakes static activation scales (calibrate_resnet) — the fast serving
    configuration; use representative frames.
    """
    from .tcn import TemporalTCN

    sizes, block_cls = VARIANTS[model.network]
    block = "basic" if block_cls is BasicBlock else "bottleneck"
    qp = quantize_resnet(variables["params"]["backbone"],
                         variables["batch_stats"]["backbone"])
    if calibrate_clips is not None:
        b, t, h, w, c = calibrate_clips.shape
        qp = calibrate_resnet(qp, calibrate_clips.reshape(b * t, h, w, c),
                              sizes, block=block, dtype=model.dtype)
    tcn = TemporalTCN(num_layers_pg=model.num_layers_pg,
                      num_layers_r=model.num_layers_r,
                      num_refinements=model.num_refinements,
                      num_f_maps=model.num_f_maps,
                      channel_dropout=0.0, dtype=model.dtype)
    qvars = {"q_backbone": qp, "tcn": variables["params"]["tcn"]}

    def fn(qvars, clips):
        b, t, h, w, c = clips.shape
        frames = clips.reshape(b * t, h, w, c)
        feats = quantized_resnet_apply(qvars["q_backbone"], frames, sizes,
                                       block=block, dtype=model.dtype,
                                       s2d_stem=s2d_stem,
                                       fused_stem=fused_stem)
        seq = feats["pooled"].reshape(b, t, -1)
        out = tcn.apply({"params": qvars["tcn"]}, seq, train=False)
        return {"ivt": out["ivt"][0], "i": out["i"][0], "v": out["v"][0],
                "t": out["t"][0], "features": seq}

    return fn, qvars
