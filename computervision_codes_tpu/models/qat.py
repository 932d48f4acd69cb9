"""Quantization-aware fine-tuning (weight fake-quant with STE).

The int8-PTQ serving path (models/quantized.py) quantizes trained float
conv weights after the fact; any drift it introduces is unrecoverable.
QAT instead trains THROUGH the quantizer: every backbone conv kernel is
replaced in the forward by its quantize->dequantize image (the EXACT
``ops/quant.quantize_weight`` policy the serving path applies — same
clip, same per-output-channel scales, same 1e-8 floor), with a
straight-through estimator so gradients flow to the float master
weights. After QAT, serving-time weight quantization reproduces the
train-time forward bit-for-bit — the weight-side PTQ error is zero by
construction, leaving only the activation-scale error.

The reference has no quantized serving at all (SURVEY §6); this closes
the loop on the TPU-native int8 path. Wired into the student driver as
``--qat`` (cli/spatial_cnn.py).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..ops.quant import quantize_weight


def fake_quant_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """quantize->dequantize with identity (straight-through) gradients."""
    q, scale = quantize_weight(w)
    deq = (q.astype(jnp.float32) * scale).astype(w.dtype)
    return w + jax.lax.stop_gradient(deq - w)


def fake_quant_convs(params: Dict, float_stem: bool = True) -> Dict:
    """Fake-quant every conv kernel of a ResNet param tree, mirroring
    quantize_resnet's coverage: layer{s}_{b} conv1..3 + downsample_conv;
    ``float_stem`` leaves conv1 float (the serving default — int8 is
    slower there and the stem dominates PTQ noise)."""
    out = dict(params)
    if not float_stem and "conv1" in out:
        out["conv1"] = {**out["conv1"],
                        "kernel": fake_quant_kernel(out["conv1"]["kernel"])}
    for name, blk in params.items():
        if not name.startswith("layer"):
            continue
        new_blk = dict(blk)
        for conv in ("conv1", "conv2", "conv3", "downsample_conv"):
            if conv in new_blk:
                new_blk[conv] = {
                    **new_blk[conv],
                    "kernel": fake_quant_kernel(new_blk[conv]["kernel"])}
        out[name] = new_blk
    return out


def qat_params(params: Dict, submodule: str = "backbone",
               float_stem: bool = True) -> Dict:
    """Model-level param transform: fake-quant the backbone subtree."""
    if submodule not in params:
        return params
    out = dict(params)
    out[submodule] = fake_quant_convs(params[submodule],
                                      float_stem=float_stem)
    return out
