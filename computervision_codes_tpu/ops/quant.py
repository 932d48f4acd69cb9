"""Int8 post-training quantization primitives for the deployed student path.

v5e's MXU runs int8 matmuls/convs at roughly double the bf16 rate; measured
on the ResNet18 shapes that dominate the e2e bench the gain is 1.2-1.37x
per conv (scripts/int8_microbench.py). The reference has no quantized path
(torch fp16/fp32 only) — this is a TPU-native extension for serving.

Scheme (standard symmetric PTQ):
  * weights: per-output-channel absmax scales, quantized AT CONVERSION TIME;
  * activations: per-tensor dynamic absmax, quantized inline (one VPU
    reduction, fused by XLA into the surrounding elementwise chain);
  * conv accumulates int8 x int8 -> int32 on the MXU, then dequantizes with
    scale_act * scale_w[c] — BatchNorm (inference) folds into that same
    per-channel affine, so quantized conv + BN is ONE fused epilogue.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(w: jnp.ndarray, axis: int = -1):
    """Symmetric per-output-channel int8 weights. w: HWIO (out = last)."""
    red = tuple(i for i in range(w.ndim) if i != (axis % w.ndim))
    absmax = jnp.max(jnp.abs(w), axis=red, keepdims=True)
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.reshape(-1)  # (O,)


def quantize_activation(x: jnp.ndarray):
    """Symmetric per-tensor dynamic int8. Returns (q, scale f32)."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf))
    scale = jnp.maximum(absmax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def conv_i8(xq: jnp.ndarray, wq: jnp.ndarray, stride: int = 1,
            padding="SAME") -> jnp.ndarray:
    """int8 x int8 -> int32 NHWC conv (MXU double-rate path)."""
    return jax.lax.conv_general_dilated(
        xq, wq, (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


def fold_bn(scale_w: jnp.ndarray, bn: dict, eps: float = 1e-5):
    """Fold inference BatchNorm into the dequant affine.

    y = gamma * (conv - mean) / sqrt(var + eps) + beta
      = conv * s + b   with s = gamma/sqrt(var+eps), b = beta - mean*s.
    Returns (per-channel multiplier for the int32 accum, bias) so that
    out = acc_i32 * (scale_act * scale_w * s) + b.
    """
    s = bn["scale"] * jax.lax.rsqrt(bn["var"] + eps)
    b = bn["bias"] - bn["mean"] * s
    return scale_w * s, b


def quantized_conv_bn(x: jnp.ndarray, qw: dict, *, stride: int = 1,
                      padding="SAME", relu: bool = False,
                      leaky_slope=None,
                      dtype=jnp.bfloat16, record=None) -> jnp.ndarray:
    """x (NHWC float) -> quantize -> int8 conv -> fused dequant+BN[+relu].

    qw: {"w_q" int8 HWIO, "mult" (O,) = scale_w * bn_s, "bias" (O,),
    optional "act_scale" scalar}. With "act_scale" present the input is
    quantized with that STATIC scale — a pure elementwise op XLA fuses
    into the previous layer's epilogue (the dynamic absmax forces an extra
    full-tensor materialization per conv, which measured as a complete
    wash e2e: scripts/int8_e2e_bench.py). ``record`` (a list) switches to
    calibration mode: dynamic scales are appended eagerly.
    """
    if "w" in qw:
        # BN-folded FLOAT conv (no int8): the ResNet stem's K=147 GEMM is
        # MXU-hostile and int8 measured SLOWER than bf16 there
        # (scripts/stem_probe.py: 1.24 vs 0.87 ms/128 frames), so the stem
        # ships folded-bf16 while the 128ch+ stages go int8
        acc = jax.lax.conv_general_dilated(
            x.astype(dtype), qw["w"].astype(dtype), (stride, stride),
            padding, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        out = acc + qw["bias"][None, None, None, :]
        if leaky_slope is not None:
            out = jax.nn.leaky_relu(out, leaky_slope)
        elif relu:
            out = jax.nn.relu(out)
        return out.astype(dtype)
    if record is not None:
        xq, s_act = quantize_activation(x)
        record.append(float(s_act))
    elif "act_scale" in qw:
        s_act = qw["act_scale"]
        xf = x.astype(jnp.float32)
        xq = jnp.clip(jnp.round(xf / s_act), -127, 127).astype(jnp.int8)
    else:
        xq, s_act = quantize_activation(x)
    acc = conv_i8(xq, qw["w_q"], stride=stride, padding=padding)
    out = acc.astype(jnp.float32) * (s_act * qw["mult"])[None, None, None, :]
    out = out + qw["bias"][None, None, None, :]
    if leaky_slope is not None:  # TResNet ABN epilogue (leaky-relu)
        out = jax.nn.leaky_relu(out, leaky_slope)
    elif relu:
        out = jax.nn.relu(out)
    return out.astype(dtype)
