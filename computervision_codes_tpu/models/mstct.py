"""MS-TCT temporal teacher (multi-scale temporal conv-transformer).

TPU-native re-design of the reference MS-TCT assembly
(MT4MTLKD/Temporal_mstct/network.py:46-118 + MSTCT/Temporal_Encoder.py +
MSTCT/TS_Mixer.py). Defaults = the driver's hyperparameters
(Temporal_mstct/run.py:306-313): embed dims [256, 384, 576, 864],
2 GLR blocks per stage, 8 heads, mlp_ratio 8, final embedding 512.

Differences from the reference that are *layout-only* (results identical):
  * sequences are (B, T, C) end-to-end (the reference flips between
    (B, C, T) and (B, T, C) around every conv);
  * full attention is computed through ``ops.attention.multi_head_attention``
    which lowers to a fused Pallas flash-attention kernel on TPU for long
    sequences (the reference materializes the O(T²) matrix —
    MSTCT/Temporal_Encoder.py:76-88 — which is the memory wall for
    full-video eval; SURVEY.md §5 long-context notes).

The stage outputs keep stride 1 (the reference uses stride-1 merging blocks,
Temporal_Encoder.py:171-200), so all four scales share T; the Temporal_Mixer
still resizes defensively, matching TS_Mixer.py:50-63.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh

from ..ops.attention import multi_head_attention
from .common import Mlp, interpolate_1d, trunc_normal_init


class TemporalMergingBlock(nn.Module):
    """conv1d(k3) channel projection + LayerNorm (Temporal_Encoder.py:129-161)."""

    embed_dim: int
    kernel: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        x = nn.Conv(self.embed_dim, (self.kernel,), strides=(self.stride,),
                    padding=self.kernel // 2, dtype=self.dtype, name="proj")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)


class GlobalRelationalBlock(nn.Module):
    """Full self-attention (Temporal_Encoder.py:46-88).

    With ``ring_mesh`` set, the T-sharded inputs stay sharded and attention
    runs as an exact ring over the mesh's seq axis (K/V rotate via
    ppermute with flash running statistics, parallel/ring_attention.py) —
    for videos where even the all-gathered K/V of the GSPMD path exceed
    one chip's memory.
    """

    dim: int
    num_heads: int = 8
    dtype: jnp.dtype = jnp.float32
    ring_mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, x):
        B, T, C = x.shape
        H = self.num_heads
        q = nn.Dense(C, dtype=self.dtype, kernel_init=trunc_normal_init(),
                     name="q")(x)
        kv = nn.Dense(2 * C, dtype=self.dtype, kernel_init=trunc_normal_init(),
                      name="kv")(x)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads(t):
            return t.reshape(B, T, H, C // H).transpose(0, 2, 1, 3)

        if self.ring_mesh is not None:
            from ..parallel.ring_attention import ring_attention

            out = ring_attention(heads(q), heads(k), heads(v),
                                 self.ring_mesh)
        else:
            out = multi_head_attention(heads(q), heads(k), heads(v))
        out = out.transpose(0, 2, 1, 3).reshape(B, T, C)
        return nn.Dense(C, dtype=self.dtype, kernel_init=trunc_normal_init(),
                        name="proj")(out)


class LocalRelationalBlock(nn.Module):
    """linear -> depthwise conv(k3) -> gelu -> drop -> linear -> drop
    (Temporal_Encoder.py:5-43)."""

    hidden_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_dim = x.shape[-1]
        x = nn.Dense(self.hidden_dim, dtype=self.dtype,
                     kernel_init=trunc_normal_init(), name="linear1")(x)
        x = nn.Conv(self.hidden_dim, (3,), padding=1,
                    feature_group_count=self.hidden_dim, dtype=self.dtype,
                    name="tc")(x)
        x = nn.gelu(x, approximate=False)  # torch nn.GELU parity
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(out_dim, dtype=self.dtype,
                     kernel_init=trunc_normal_init(), name="linear2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class GLRBlock(nn.Module):
    """x + GRB(norm(x)); x + LRB(norm(x)) (Temporal_Encoder.py:91-126)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 8.0
    dtype: jnp.dtype = jnp.float32
    ring_mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = x + GlobalRelationalBlock(self.dim, self.num_heads, self.dtype,
                                      ring_mesh=self.ring_mesh,
                                      name="grb")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x))
        x = x + LocalRelationalBlock(int(self.dim * self.mlp_ratio),
                                     dtype=self.dtype, name="lrb")(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x),
            deterministic=deterministic)
        return x


class TemporalEncoder(nn.Module):
    """4 stages of merge + GLR blocks (Temporal_Encoder.py:164-256)."""

    embed_dims: Sequence[int] = (256, 384, 576, 864)
    num_heads: int = 8
    mlp_ratio: float = 8.0
    num_blocks: int = 2
    dtype: jnp.dtype = jnp.float32
    ring_mesh: Optional[Mesh] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> List[jnp.ndarray]:
        outs = []
        for si, dim in enumerate(self.embed_dims):
            x = TemporalMergingBlock(dim, dtype=self.dtype,
                                     name=f"merge{si + 1}")(x)
            for bi in range(self.num_blocks):
                x = GLRBlock(dim, self.num_heads, self.mlp_ratio, self.dtype,
                             ring_mesh=self.ring_mesh,
                             name=f"stage{si + 1}_block{bi}")(
                    x, deterministic=deterministic)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm{si + 1}")(x)
            outs.append(x)
        return outs


class TemporalMixer(nn.Module):
    """FPN-style multi-scale mixing (TS_Mixer.py:28-84)."""

    embedding_dim: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]) -> jnp.ndarray:
        f1, f2, f3, f4 = feats
        t1 = f1.shape[1]

        def lin(name, x):
            return nn.Dense(self.embedding_dim, dtype=self.dtype, name=name)(x)

        def resize(x):
            if x.shape[1] == t1:
                return x
            return jnp.swapaxes(
                interpolate_1d(jnp.swapaxes(x, 1, 2), t1, "linear"), 1, 2)

        _f4 = resize(lin("linear_f4", f4))
        _f3 = resize(lin("linear_f3", f3))
        _f2 = resize(lin("linear_f2", f2))
        _f1 = lin("linear_f1", f1)

        def mix(name):
            return nn.Dense(self.embedding_dim, dtype=self.dtype, name=name)(_f4)

        f3_v = mix("linear1") + _f3
        f2_v = mix("linear2") + _f2
        f1_v = mix("linear3") + _f1
        f3_t = mix("linear4") + _f3
        f2_t = mix("linear5") + _f2
        f1_t = mix("linear6") + _f1
        f3_ivt = mix("linear7") + _f3 + f3_v + f3_t
        f2_ivt = mix("linear8") + _f2 + f2_v + f2_t
        f1_ivt = mix("linear9") + _f1 + f1_v + f1_t
        return jnp.concatenate([_f4, f3_ivt, f2_ivt, f1_ivt], axis=-1)


class MSTCTClassifier(nn.Module):
    """fuse(1x1) -> dropout -> predict(1x1) (Temporal_mstct/network.py:104-118)."""

    embedding_dim: int
    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        feat = nn.Dense(self.embedding_dim, dtype=self.dtype,
                        name="linear_fuse")(x)
        feat = nn.Dropout(0.5)(feat, deterministic=deterministic)
        logits = nn.Dense(self.num_classes, dtype=self.dtype,
                          name="linear_pred")(feat)
        return logits, feat


class MSTCT(nn.Module):
    """Full MS-TCT temporal teacher over cached features (B, T, D_in)."""

    embed_dims: Sequence[int] = (256, 384, 576, 864)
    num_blocks: int = 2
    num_heads: int = 8
    mlp_ratio: float = 8.0
    final_embedding_dim: int = 512
    num_classes: int = 100  # the per-task head width (single-task teacher)
    dtype: jnp.dtype = jnp.float32
    ring_mesh: Optional[Mesh] = None  # exact ring attention over seq axis

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Dict:
        x = x.astype(self.dtype)
        x = nn.Dropout(0.5)(x, deterministic=not train)
        stages = TemporalEncoder(self.embed_dims, self.num_heads,
                                 self.mlp_ratio, self.num_blocks, self.dtype,
                                 ring_mesh=self.ring_mesh,
                                 name="encoder")(x, deterministic=not train)
        concat = TemporalMixer(self.final_embedding_dim, self.dtype,
                               name="mixer")(stages)
        logits, feat = MSTCTClassifier(self.final_embedding_dim,
                                       self.num_classes, self.dtype,
                                       name="classifier")(
            concat, deterministic=not train)
        return {"logits": logits, "feature": feat, "concat_feature": concat}
