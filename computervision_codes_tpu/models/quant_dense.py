"""Int8 GEMMs for ANY Flax model via method interception (teacher serving).

The SwinL-384 teacher's time lives in its dense GEMMs (docs/BENCH.md
round-2 ablation: stage3 = 38 of 72 ms at ~31% MXU) — the same lever that
sped the student 1.25x (models/quantized.py) applies, but the teacher is a
deep Flax module tree. Instead of rewriting it, ``nn.intercept_methods``
swaps every ``nn.Dense.__call__`` for a symmetric-int8 matmul at apply
time: per-output-channel weights quantized once offline, per-layer static
activation scales baked by one calibration pass, int8 x int8 -> int32 on
the MXU's double-rate path, dequant+bias fused by XLA into the epilogue.

Works for Q2L/Swin, CvT, TResNet heads, MS-TCT — anything built on
nn.Dense. Attention softmax, layernorms and convs stay in the model dtype.

Use:
    scales = collect_dense_scales(model, variables, example)   # eager pass
    qd = quantize_dense_params(variables)                      # int8 weights
    y = int8_apply(model, variables, qd, scales, x)            # jittable
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.quant import quantize_weight


def _dense_path(context) -> str:
    return "/".join(context.module.path)


def collect_dense_scales(model, variables, *args, margin: float = 1.0,
                         **kwargs) -> Dict[str, float]:
    """One calibration forward recording each nn.Dense input's absmax scale.

    Runs as ONE jitted program returning the per-layer absmaxes as
    auxiliary outputs — an eager pass would dispatch every op separately
    (on the axon remote backend that is one HTTP round-trip per op, which
    effectively hangs for SwinL-sized models)."""

    def calib(variables, *a):
        absmax: Dict[str, jnp.ndarray] = {}

        def ic(next_fn, aa, kw, context):
            if isinstance(context.module, nn.Dense) \
                    and context.method_name == "__call__":
                p = _dense_path(context)
                m = jnp.max(jnp.abs(aa[0].astype(jnp.float32)))
                absmax[p] = jnp.maximum(absmax[p], m) if p in absmax else m
            return next_fn(*aa, **kw)

        with nn.intercept_methods(ic):
            model.apply(variables, *a, **kwargs)
        return absmax

    absmax = jax.jit(calib)(variables, *args)
    return {k: max(float(v) * margin / 127.0, 1e-8)
            for k, v in absmax.items()}


def quantize_dense_params(variables) -> Dict[str, Tuple]:
    """Walk the param tree; every 2-D 'kernel' (an nn.Dense) becomes
    (w_q int8 (K,N), s_w (N,)). Keyed by the module path string."""
    out: Dict[str, Tuple] = {}

    def walk(tree, path):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, path + (k,))
            elif k == "kernel" and getattr(v, "ndim", 0) == 2:
                out["/".join(path)] = quantize_weight(v, axis=-1)

    walk(variables["params"], ())
    return out


def int8_apply(model, variables, qdense: Dict, scales: Dict, *args,
               min_features: int = 0, **kwargs):
    """model.apply with every calibrated nn.Dense running int8 on the MXU.

    Layers missing from ``scales``/``qdense`` (or narrower than
    ``min_features``) fall through to the float path — tiny heads are not
    worth the quantize pass.
    """

    def ic(next_fn, a, kw, context):
        if not (isinstance(context.module, nn.Dense)
                and context.method_name == "__call__"):
            return next_fn(*a, **kw)
        p = _dense_path(context)
        if p not in qdense or p not in scales:
            return next_fn(*a, **kw)
        w_q, s_w = qdense[p]
        if w_q.shape[0] < min_features:
            return next_fn(*a, **kw)
        x = a[0]
        s_act = jnp.float32(scales[p])
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_act),
                      -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, w_q, (((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        out = acc.astype(jnp.float32) * (s_act * s_w)
        if context.module.use_bias:
            out = out + context.module.variables["params"]["bias"]
        dt = context.module.dtype or x.dtype
        return out.astype(dt)

    with nn.intercept_methods(ic):
        return model.apply(variables, *args, **kwargs)
