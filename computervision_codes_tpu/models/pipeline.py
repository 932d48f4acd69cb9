"""End-to-end video recognizer: pixels -> triplet/component logits, one program.

The reference runs its pipeline as four separate processes communicating
through pickle files (SURVEY.md §1). For inference/serving, this module
fuses the deployed path — spatial backbone over every frame + temporal TCN
over the resulting feature sequence + all task heads — into ONE jittable
function, so a whole clip goes pixels -> logits in a single XLA program
(the BASELINE.json north star). No host round-trips, bf16 on the MXU.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from .resnet import VARIANTS as RESNET_VARIANTS, ResNet
from .tcn import TemporalTCN


class EndToEndRecognizer(nn.Module):
    """ResNet student over frames + TCN temporal head (deployed path).

    Input (B, T, H, W, 3) normalized frames; output per-frame logits for all
    four tasks from TCN pyramid level 0 plus the per-frame spatial logits.
    ``causal=True`` makes every temporal layer front-padded, enabling exact
    online inference (serving.StreamingSession); the default symmetric
    variant matches the reference's offline TCN.
    """

    network: str = "resnet18"
    num_layers_pg: int = 11
    num_layers_r: int = 10
    num_refinements: int = 3
    num_f_maps: int = 512
    causal: bool = False  # True = online-capable head (StreamingSession)
    s2d_stem: bool = False  # space-to-depth conv1 execution plan (same
    # params/math — models/resnet._s2d_conv1; serving-path A/B)
    fused_stem: bool = False  # eval-only fused conv+BN+relu+maxpool
    # Pallas stem (ops/stem_pool; BN folded at trace time)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, clips: jnp.ndarray, train: bool = False) -> Dict:
        b, t, h, w, c = clips.shape
        sizes, block = RESNET_VARIANTS[self.network]
        backbone = ResNet(stage_sizes=sizes, block_cls=block,
                          s2d_stem=self.s2d_stem,
                          fused_stem=self.fused_stem,
                          dtype=self.dtype, name="backbone")
        frames = clips.reshape(b * t, h, w, c)
        feats = backbone(frames, train=train)["pooled"]  # (B*T, D)
        seq = feats.reshape(b, t, -1)
        tcn = TemporalTCN(num_layers_pg=self.num_layers_pg,
                          num_layers_r=self.num_layers_r,
                          num_refinements=self.num_refinements,
                          num_f_maps=self.num_f_maps, causal=self.causal,
                          channel_dropout=0.0, dtype=self.dtype, name="tcn")
        out = tcn(seq, train=train)
        return {
            "ivt": out["ivt"][0],  # (B, T, 100) pyramid level 0
            "i": out["i"][0],
            "v": out["v"][0],
            "t": out["t"][0],
            "features": seq,
        }
