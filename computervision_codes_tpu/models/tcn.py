"""Causal dilated TCN + FPN temporal student.

TPU-native re-design of the reference temporal student
(MT4MTLKD/Temporal_tenco/network.py:14-198 ``VideoNas``; the TERL variant
TERL/0_5fold_TCN_black/network.py is the same network plus a masking helper).

Structure (defaults = reference flags, Temporal_tenco/run.py:73-75,313):
  * prediction-generation stage: 1x1 conv -> 11 dilated residual layers
    (dilation 2^i, receptive field ~2k frames) -> per-stage logits;
  * 3 refinement stages of 10 dilated residual layers each;
  * a 1-lateral-conv FPN over the 4 stage features (the reference declares
    three lateral convs but applies only ``latlayer1`` to every level,
    network.py:103-105 — reproduced faithfully with a single conv);
  * shared conv heads for ivt/i/v/t applied to every pyramid level
    (network.py:62-67);
  * optional 75% random input masking during training (network.py:43-50)
    — implemented as an elementwise Bernoulli(keep=0.25) mask (the
    reference permutes a fixed 75% of elements; identical in expectation).

Layout is (B, T, C) throughout (channels-last; 1D convs lower to MXU
matmuls). Sequence lengths are static per compilation; variable-length
videos are padded + masked by the caller.

Dropout notes: the reference uses default-p ``nn.Dropout()`` (p=0.5) inside
every dilated layer and a channel dropout (Dropout2d) on the input
(network.py:117,126-127,191) — both reproduced.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.dilated_conv import dilated_residual_fused
from .common import interpolate_1d


def conv1d(features: int, kernel: int = 1, dilation: int = 1,
           padding="SAME", dtype=jnp.float32, name=None):
    return nn.Conv(features, (kernel,), kernel_dilation=dilation,
                   padding=padding, dtype=dtype, name=name)


class DilatedResidualLayer(nn.Module):
    """conv(k3, dilated) -> relu -> conv1x1 -> dropout -> +residual.

    ``causal=True`` pads 2*dilation zeros at the front instead of symmetric
    padding (reference DilatedResidualCausalLayer, network.py:165-183;
    the default layer used by BaseCausalTCN is the symmetric one,
    network.py:186-198).
    """

    dilation: int
    features: int
    causal: bool = False
    dropout: float = 0.5
    use_fused: bool = True  # Pallas fused layer on the TPU eval path
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.features
        init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in",
                                                "truncated_normal")
        w_taps = self.param("w_taps", init, (3, c, c))
        b1 = self.param("b1", nn.initializers.zeros, (c,))
        w2 = self.param("w2", nn.initializers.lecun_normal(), (c, c))
        b2 = self.param("b2", nn.initializers.zeros, (c,))
        w_taps = w_taps.astype(self.dtype)
        d = self.dilation
        t = x.shape[1]
        if self.use_fused and not train:
            out_res = dilated_residual_fused(
                x, w_taps, b1.astype(self.dtype), w2.astype(self.dtype),
                b2.astype(self.dtype), d, self.causal)
            # fused path includes the residual; dropout is identity in eval
            return out_res
        if self.causal:
            xp = jnp.pad(x, ((0, 0), (2 * d, 0), (0, 0)))
        else:
            xp = jnp.pad(x, ((0, 0), (d, d), (0, 0)))
        h = (xp[:, :t] @ w_taps[0] + xp[:, d:d + t] @ w_taps[1]
             + xp[:, 2 * d:2 * d + t] @ w_taps[2] + b1.astype(self.dtype))
        h = nn.relu(h)
        out = h @ w2.astype(self.dtype) + b2.astype(self.dtype)
        out = nn.Dropout(self.dropout)(out, deterministic=not train)
        return x + out


class TCNStage(nn.Module):
    """One stack of dilated residual layers with exponentially growing dilation."""

    num_layers: int
    features: int
    causal: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_layers):
            x = DilatedResidualLayer(dilation=2 ** i, features=self.features,
                                     causal=self.causal, dtype=self.dtype,
                                     name=f"layer{i}")(x, train=train)
        return x


class FPN1D(nn.Module):
    """Temporal feature pyramid: top-down linear-upsample + single lateral conv."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]) -> List[jnp.ndarray]:
        lat = conv1d(self.features, 1, dtype=self.dtype, name="latlayer1")

        def up_add(x, y):
            # interpolate over time; our layout is (B, T, C) -> transpose for
            # the (B, C, T) helper then back
            xt = interpolate_1d(jnp.swapaxes(x, 1, 2), y.shape[1], "linear")
            return jnp.swapaxes(xt, 1, 2) + y

        # top-down: deepest feature unchanged, laterals added upward
        out = [feats[-1]]
        for c in reversed(feats[:-1]):
            out.append(up_add(out[-1], lat(c)))
        return out[::-1]


class TemporalTCN(nn.Module):
    """PG + refinements + FPN + shared multi-task heads (see module docstring)."""

    num_layers_pg: int = 11
    num_layers_r: int = 10
    num_refinements: int = 3
    num_f_maps: int = 512
    num_classes: int = 100
    num_tool: int = 6
    num_verb: int = 10
    num_target: int = 15
    use_fpn: bool = True
    causal: bool = False
    hier: bool = False  # avg-pool (k7, s3) after each refinement — the
    # reference's hierarchical pyramid (Temporal_tenco/network.py:145,156-158)
    mask_rate: float = 0.75
    channel_dropout: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 apply_mask: bool = False) -> Dict[str, List[jnp.ndarray]]:
        # x: (B, T, D)
        x = x.astype(self.dtype)
        if apply_mask and train and self.mask_rate > 0:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1.0 - self.mask_rate, x.shape)
            x = x * keep.astype(x.dtype)
        # channel dropout (Dropout2d over (B,C,T): same channel for all T)
        x = nn.Dropout(self.channel_dropout, broadcast_dims=(1,))(
            x, deterministic=not train)

        f = conv1d(self.num_f_maps, 1, dtype=self.dtype, name="pg_conv_in")(x)
        f = TCNStage(self.num_layers_pg, self.num_f_maps, self.causal,
                     self.dtype, name="pg")(f, train=train)
        feats = [f]
        for r in range(self.num_refinements):
            f = TCNStage(self.num_layers_r, self.num_f_maps, self.causal,
                         self.dtype, name=f"refine{r}")(f, train=train)
            if self.hier:
                f = nn.avg_pool(f[:, :, None, :], (7, 1), strides=(3, 1),
                                padding="VALID")[:, :, 0, :]
            feats.append(f)

        if self.use_fpn:
            feats = FPN1D(self.num_f_maps, dtype=self.dtype, name="fpn")(feats)

        heads = {
            "ivt": conv1d(self.num_classes, 1, dtype=self.dtype, name="head_ivt"),
            "i": conv1d(self.num_tool, 1, dtype=self.dtype, name="head_i"),
            "v": conv1d(self.num_verb, 1, dtype=self.dtype, name="head_v"),
            "t": conv1d(self.num_target, 1, dtype=self.dtype, name="head_t"),
        }
        out = {k: [head(fl) for fl in feats] for k, head in heads.items()}
        out["features"] = feats
        return out
