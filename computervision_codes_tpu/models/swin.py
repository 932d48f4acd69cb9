"""Swin Transformer backbone (T/B/L) — TPU-native implementation.

Re-design of the reference's vendored Swin
(MT4MTLKD/Spatial_transformer/models/swin_transformer.py: WindowAttention
:66-162, SwinTransformerBlock :164-290, PatchMerging :292-339,
forward_features :565-577, variant dict :596-631). Differences are
layout/compiler-driven, results identical:

  * NHWC feature maps end-to-end; window partition/reverse are pure
    reshapes/transposes that XLA folds away;
  * all windows of all images are batched into one (B·nW, heads, N, d)
    attention — one big MXU matmul instead of per-window loops;
  * the shifted-window attention mask is built with numpy at trace time
    (shapes are static under jit) and added to the logits;
  * relative-position-bias uses the standard (2Wh-1)(2Ww-1) table with a
    precomputed flat index.

Feature-map outputs: dict with the final (B, H/32, W/32, C) map (the Q2L
memory input), the pooled vector, and optionally the head logits (TERL
keeps the head at moco_dim — models/backbone.py:195-210 in TERL).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.window_attention import window_attention_fused
from .common import DropPath, Mlp, trunc_normal_init

VARIANTS = {
    "swin_T_224_1k": dict(embed_dim=96, depths=(2, 2, 6, 2),
                          num_heads=(3, 6, 12, 24), window_size=7),
    "swin_B_224_22k": dict(embed_dim=128, depths=(2, 2, 18, 2),
                           num_heads=(4, 8, 16, 32), window_size=7),
    "swin_B_384_22k": dict(embed_dim=128, depths=(2, 2, 18, 2),
                           num_heads=(4, 8, 16, 32), window_size=12),
    "swin_L_224_22k": dict(embed_dim=192, depths=(2, 2, 18, 2),
                           num_heads=(6, 12, 24, 48), window_size=7),
    "swin_L_384_22k": dict(embed_dim=192, depths=(2, 2, 18, 2),
                           num_heads=(6, 12, 24, 48), window_size=12),
    # not in the reference: a miniature variant for smoke tests / CI
    "swin_nano_64": dict(embed_dim=32, depths=(1, 1, 2, 1),
                         num_heads=(1, 2, 4, 8), window_size=4),
}


def window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, w*w, C)."""
    b, h, wd, c = x.shape
    x = x.reshape(b, h // w, w, wd // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, c)


def window_reverse(windows: jnp.ndarray, w: int, h: int, wd: int) -> jnp.ndarray:
    """(B*nW, w*w, C) -> (B, H, W, C)."""
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // w) * (wd // w))
    x = windows.reshape(b, h // w, wd // w, w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, wd, c)


def _relative_position_index(w: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += w - 1
    rel[:, :, 1] += w - 1
    rel[:, :, 0] *= 2 * w - 1
    return rel.sum(-1)  # (w*w, w*w)


def _shift_attn_mask(h: int, wd: int, w: int, shift: int) -> np.ndarray:
    """(nW, N, N) additive mask (0 / -100) for shifted windows."""
    img = np.zeros((1, h, wd, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[:, hs, ws, :] = cnt
            cnt += 1
    win = img.reshape(1, h // w, w, wd // w, w, 1)
    win = win.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    window: int
    num_heads: int
    use_fused_kernel: bool = False  # the one-window kernel measured SLOWER
    # than XLA (docs/BENCH.md); the multi-window variant (fused_block > 1)
    # amortizes the grid overhead it lost to
    fused_block: int = 8  # windows per grid step for the fused kernel
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        bw, n, c = x.shape  # (B*nW, N, C)
        h = self.num_heads
        hd = c // h
        qkv = nn.Dense(3 * c, dtype=self.dtype, kernel_init=trunc_normal_init(),
                       name="qkv")(x)
        qkv = qkv.reshape(bw, n, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        table = self.param(
            "relative_position_bias_table", trunc_normal_init(),
            ((2 * self.window - 1) ** 2, h))
        idx = _relative_position_index(self.window).reshape(-1)
        bias = table[idx].reshape(n, n, h).transpose(2, 0, 1)  # (h, N, N)

        if self.use_fused_kernel:
            nw = mask.shape[0] if mask is not None else 1
            out = window_attention_fused(q, k, v, bias.astype(self.dtype),
                                         mask, nw, self.fused_block)
        else:
            attn = jnp.einsum("bhnd,bhmd->bhnm", q * (hd ** -0.5), k)
            attn = attn + bias[None].astype(attn.dtype)
            if mask is not None:
                nw = mask.shape[0]
                attn = attn.reshape(bw // nw, nw, h, n, n) + \
                    mask[None, :, None].astype(attn.dtype)
                attn = attn.reshape(bw, h, n, n)
            attn = nn.softmax(attn.astype(jnp.float32),
                              axis=-1).astype(self.dtype)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(bw, n, c)
        return nn.Dense(c, dtype=self.dtype, kernel_init=trunc_normal_init(),
                        name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dropout: float = 0.0
    use_fused_attn: bool = False
    fused_block: int = 8
    # fused_eval: None = auto (fused Pallas half-block kernels on the TPU
    # eval path — measured 1.3-2.5x per stage, scripts/swin_fused_bench.py);
    # True forces them (CPU interpret, for parity tests); False disables.
    # Init and training always take the XLA path, so the param tree and
    # gradients are identical either way.
    fused_eval: Optional[bool] = None
    # fused_split: run the two half-block kernels instead of the merged
    # single-kernel block (ops/swin_block) — kept for A/B benching
    fused_split: bool = False
    # quant_eval: int8-MXU GEMMs inside the fused kernels (per-channel
    # int8 weights x dynamic activation scales) where measured faster
    # (dims >= quant_min_dim, scripts/int8_kernel_probe.py) — PTQ
    # accuracy, opt-in
    quant_eval: bool = False
    quant_min_dim: int = 768
    # fused_train: run the TRAIN forward through the Pallas half-block
    # kernels with reference-autodiff backward (ops/swin_train) — both
    # the forward and the remat replay ride the fast kernels while
    # gradients stay exactly the XLA reference's
    fused_train: bool = False
    dtype: jnp.dtype = jnp.float32

    def _attn_kernel_inputs(self, x: jnp.ndarray):
        """Shared preamble of every fused path: rel-pos bias gather,
        shift gating, input roll and shift mask. Returns
        (params, x_rolled, bias, mask-or-None, shift)."""
        p = self.variables["params"]
        b, hgt, wid, c = x.shape
        w = self.window
        n = w * w
        h = self.num_heads
        shift = self.shift if min(hgt, wid) > w else 0
        table = p["attn"]["relative_position_bias_table"]
        idx = _relative_position_index(w).reshape(-1)
        bias = table[idx].reshape(n, n, h).transpose(2, 0, 1).astype(
            self.dtype)
        if shift:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(hgt, wid, w, shift))
        else:
            mask = None
        return p, x, bias, mask, shift

    def _fused_full_block(self, x: jnp.ndarray) -> jnp.ndarray:
        """The whole block (attn + MLP halves) through ops/swin_block's
        single kernel — one launch, no HBM round-trip for the intermediate.
        Attention commutes with the shift roll (LN/MLP are positionwise),
        so the roll/unroll stays outside, as in the split path."""
        from ..ops.swin_block import swin_block_fused

        w, h = self.window, self.num_heads
        p, x, bias, mask, shift = self._attn_kernel_inputs(x)
        mp = p["mlp"]
        x = swin_block_fused(
            x, p["norm1"]["scale"], p["norm1"]["bias"],
            p["attn"]["qkv"]["kernel"].astype(self.dtype),
            p["attn"]["qkv"]["bias"].astype(self.dtype),
            p["attn"]["proj"]["kernel"].astype(self.dtype),
            p["attn"]["proj"]["bias"].astype(self.dtype),
            bias, mask,
            p["norm2"]["scale"], p["norm2"]["bias"],
            mp["Dense_0"]["kernel"].astype(self.dtype),
            mp["Dense_0"]["bias"].astype(self.dtype),
            mp["Dense_1"]["kernel"].astype(self.dtype),
            mp["Dense_1"]["bias"].astype(self.dtype),
            window=w, num_heads=h,
            quant=self.quant_eval and self.dim >= self.quant_min_dim)
        if shift:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        return x

    def _fused_attn_half(self, x: jnp.ndarray) -> jnp.ndarray:
        """x + proj(window_attn(LN1(x))) through ops/window_mhsa, reading
        the SAME param tree the XLA path creates."""
        from ..ops.window_mhsa import window_mhsa_fused

        w, h = self.window, self.num_heads
        p, x, bias, mask, shift = self._attn_kernel_inputs(x)
        x = window_mhsa_fused(
            x, p["norm1"]["scale"], p["norm1"]["bias"],
            p["attn"]["qkv"]["kernel"].astype(self.dtype),
            p["attn"]["qkv"]["bias"].astype(self.dtype),
            p["attn"]["proj"]["kernel"].astype(self.dtype),
            p["attn"]["proj"]["bias"].astype(self.dtype),
            bias, mask, window=w, num_heads=h,
            quant=self.quant_eval and self.dim >= self.quant_min_dim)
        if shift:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        return x

    def _fused_mlp_half(self, x: jnp.ndarray) -> jnp.ndarray:
        """x + mlp(LN2(x)) through ops/mlp_block (hidden-chunked, so it
        serves every stage incl. dim 1536)."""
        from ..ops.mlp_block import mlp_block_fused

        p = self.variables["params"]
        mp = p["mlp"]
        return mlp_block_fused(
            x, p["norm2"]["scale"], p["norm2"]["bias"],
            mp["Dense_0"]["kernel"].astype(self.dtype),
            mp["Dense_0"]["bias"].astype(self.dtype),
            mp["Dense_1"]["kernel"].astype(self.dtype),
            mp["Dense_1"]["bias"].astype(self.dtype),
            quant=self.quant_eval and self.dim >= self.quant_min_dim)

    def _fused_train_block(self, x: jnp.ndarray,
                           deterministic: bool) -> jnp.ndarray:
        """Training forward through the fused kernels (custom_vjp:
        Pallas forward, reference-autodiff backward); DropPath sits
        between each branch and its residual, as in the XLA path."""
        from ..ops.swin_train import make_attn_branch, make_mlp_branch

        w, h = self.window, self.num_heads
        p, xr, bias, mask, shift = self._attn_kernel_inputs(x)
        args = (xr, p["norm1"]["scale"], p["norm1"]["bias"],
                p["attn"]["qkv"]["kernel"].astype(self.dtype),
                p["attn"]["qkv"]["bias"].astype(self.dtype),
                p["attn"]["proj"]["kernel"].astype(self.dtype),
                p["attn"]["proj"]["bias"].astype(self.dtype), bias)
        if shift:
            branch = make_attn_branch(w, h, True)(
                *args, mask.astype(self.dtype))
        else:  # maskless fast path (no per-window zero-mask DMA)
            branch = make_attn_branch(w, h, False)(*args)
        if shift:
            branch = jnp.roll(branch, (shift, shift), axis=(1, 2))
        x = x + DropPath(self.drop_path, name="drop_path1")(
            branch, deterministic)
        mp = p["mlp"]
        mlp_out = make_mlp_branch()(
            x, p["norm2"]["scale"], p["norm2"]["bias"],
            mp["Dense_0"]["kernel"].astype(self.dtype),
            mp["Dense_0"]["bias"].astype(self.dtype),
            mp["Dense_1"]["kernel"].astype(self.dtype),
            mp["Dense_1"]["bias"].astype(self.dtype))
        return x + DropPath(self.drop_path, name="drop_path2")(
            mlp_out, deterministic)

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        b, hgt, wid, c = x.shape
        w = self.window
        use_fused = (self.fused_eval if self.fused_eval is not None
                     else jax.default_backend() == "tpu")
        fused_base = (use_fused and deterministic
                      and not self.is_initializing()
                      and not self.use_fused_attn)
        if (self.fused_train and not deterministic
                and not self.is_initializing() and not self.use_fused_attn
                and hgt % w == 0 and wid % w == 0
                and self.dim <= 768 and self.dropout == 0.0):
            # DropPath modules are declared inside; the param tree is
            # identical (attn/norm/mlp params created by the init-time
            # XLA path, read here like the fused eval halves)
            return self._fused_train_block(x, deterministic)
        # MHSA kernel: needs clean windows and a VMEM-resident QKV weight
        # (dim 1536's is 14 MiB alone, and stage 4 is GEMM-bound). Odd
        # windows (the 224-class models' window 7) run at a padded (w+1)^2
        # geometry inside the kernel — Mosaic rejects the raw (49, C)
        # shape casts ("infer-vector-layout: unsupported shape cast").
        # On-chip A/Bs (round 4, v5e): the per-op microbench said odd
        # windows lose at stage-3 dims (0.72-0.88x at 384/768), but the
        # END-TO-END A/B says the opposite — gating stage 3 back to XLA
        # dropped swin_T_224 1.11x -> 1.056x and swin_L_224 1.313x ->
        # 1.108x (scripts/swin224_bench.py, both orderings same session).
        # The ~0.1-0.25 ms per-op rows sit under the ~27 ms dispatch
        # overhead subtraction and the XLA<->Pallas layout transitions
        # the microbench never pays. e2e wins: all windows fuse at
        # dim <= 768.
        fused_attn = (fused_base and hgt % w == 0 and wid % w == 0
                      and self.dim <= 768)
        # MLP kernel: hidden-chunked weights — applies at EVERY dim
        if fused_attn:
            # merged single-kernel block wins at dims <= 384 (1.06-1.10x,
            # scripts/swin_fused_bench.py --merged_only); at 768 the MLP
            # weights no longer fit un-chunked and the per-row-strip
            # weight re-DMA makes it 0.95x — stage 3 stays on the split
            # half-block kernels. Odd windows use the split path (the
            # merged kernel keeps the even-window-only geometry)
            if self.fused_split or self.dim > 384 or w % 2:
                x = self._fused_attn_half(x)
                return self._fused_mlp_half(x)
            return self._fused_full_block(x)
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        # pad to window multiples (reference pads inside the block)
        ph = (w - hgt % w) % w
        pw = (w - wid % w) % w
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        hp, wp = hgt + ph, wid + pw
        shift = self.shift if min(hp, wp) > w else 0
        if shift:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(hp, wp, w, shift))
        else:
            mask = None
        windows = window_partition(x, w)
        windows = WindowAttention(self.dim, w, self.num_heads,
                                  use_fused_kernel=self.use_fused_attn,
                                  fused_block=self.fused_block,
                                  dtype=self.dtype,
                                  name="attn")(windows, mask, deterministic)
        x = window_reverse(windows, w, hp, wp)
        if shift:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        if ph or pw:
            x = x[:, :hgt, :wid]
        x = shortcut + DropPath(self.drop_path, name="drop_path1")(
            x, deterministic)
        # norm2 + mlp must be DECLARED on every path (identical tree);
        # the fused MLP half replaces only their execution
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")
        mlp = Mlp(int(self.dim * self.mlp_ratio), dropout=self.dropout,
                  dtype=self.dtype, name="mlp")
        if fused_base:
            # XLA attention half + fused MLP half (stage 4, odd windows)
            return self._fused_mlp_half(x)
        mlp_out = mlp(norm2(x), deterministic)
        return x + DropPath(self.drop_path, name="drop_path2")(
            mlp_out, deterministic)


class PatchMerging(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        # torch concat order: (0::2,0::2), (1::2,0::2), (0::2,1::2), (1::2,1::2)
        x = jnp.concatenate([
            x[:, 0::2, 0::2], x[:, 1::2, 0::2],
            x[:, 0::2, 1::2], x[:, 1::2, 1::2],
        ], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        kernel_init=trunc_normal_init(), name="reduction")(x)


class SwinTransformer(nn.Module):
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    dropout: float = 0.0
    patch_norm: bool = True
    use_fused_attn: bool = False  # multi-window Pallas attention kernel
    fused_block: int = 8  # windows per fused-kernel grid step
    fused_eval: Optional[bool] = None  # fused half-block kernels (SwinBlock)
    fused_split: bool = False  # split half-block kernels instead of the
    # merged single-kernel block — A/B benching only
    quant_eval: bool = False  # int8-MXU GEMMs in the fused kernels where
    # measured faster (stage dims >= quant_min_dim) — PTQ accuracy, opt-in
    quant_min_dim: int = 768
    fused_train: bool = False  # Pallas-forward/reference-backward train
    # path (ops/swin_train)
    num_classes: int = 0  # 0 = headless (Q2L strips the head)
    s2d_embed: bool = False  # patch embed as a space-to-depth GEMM
    # (stride == kernel makes it exact; C_in 3 -> 48 un-starves the MXU)
    remat: bool = False  # rematerialize blocks (jax.checkpoint) — trades
    # FLOPs for HBM so SwinL-384 trains on one chip at useful batch sizes
    remat_policy: str = "dots"  # "dots" = dots_with_no_batch_dims_saveable —
    # GEMM outputs stay resident so the backward skips recomputing the MXU
    # work and only replays the cheap elementwise chain; "" = save-nothing.
    # Default set by measurement: SwinL-384 Q2L train step 61.7 fps (dots)
    # vs 56.3 (save-nothing) on v5e b=8 (scripts/train_bench.py, round 4)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False) -> Dict:
        det = not train
        x = images.astype(self.dtype)
        if (self.s2d_embed and not self.is_initializing()
                and x.shape[1] % 4 == 0 and x.shape[2] % 4 == 0):
            # stride == kernel: the 4x4/s4 patch conv is EXACTLY a GEMM
            # over the block-4 space-to-depth view — C_in 3 -> 48 so the
            # MXU stops starving on the input channels (the C_in=3 conv
            # runs ~40% peak, docs/BENCH.md stem roofline; same trick as
            # the student stem). Same params, same math.
            pe = self.get_variable("params", "patch_embed")
            b_, h_, w_, c_ = x.shape
            xs = x.reshape(b_, h_ // 4, 4, w_ // 4, 4, c_)
            xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(
                b_, h_ // 4, w_ // 4, 16 * c_)
            k = pe["kernel"].astype(self.dtype).reshape(16 * c_,
                                                        self.embed_dim)
            x = xs @ k + pe["bias"].astype(self.dtype)
        else:
            x = nn.Conv(self.embed_dim, (4, 4), strides=4, dtype=self.dtype,
                        name="patch_embed")(x)
        if self.patch_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=det)

        total = sum(self.depths)
        dpr = np.linspace(0, self.drop_path_rate, total)
        if self.remat:
            policy = (jax.checkpoint_policies.dots_with_no_batch_dims_saveable
                      if self.remat_policy == "dots" else None)
            block_cls = nn.remat(SwinBlock, static_argnums=(2,),
                                 policy=policy)
        else:
            block_cls = SwinBlock
        bi = 0
        for si, depth in enumerate(self.depths):
            dim = self.embed_dim * (2 ** si)
            for d in range(depth):
                shift = 0 if d % 2 == 0 else self.window_size // 2
                x = block_cls(dim=dim, num_heads=self.num_heads[si],
                              window=self.window_size, shift=shift,
                              mlp_ratio=self.mlp_ratio,
                              drop_path=float(dpr[bi]), dropout=self.dropout,
                              use_fused_attn=self.use_fused_attn,
                              fused_block=self.fused_block,
                              fused_eval=self.fused_eval,
                              fused_split=self.fused_split,
                              quant_eval=self.quant_eval,
                              quant_min_dim=self.quant_min_dim,
                              fused_train=self.fused_train,
                              dtype=self.dtype,
                              name=f"stage{si}_block{d}")(x, det)
                bi += 1
            if si < len(self.depths) - 1:
                x = PatchMerging(dim=dim, dtype=self.dtype,
                                 name=f"merge{si}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        pooled = jnp.mean(x, axis=(1, 2))
        out = {"feature_map": x, "pooled": pooled}
        if self.num_classes:
            out["logits"] = nn.Dense(self.num_classes, dtype=self.dtype,
                                     kernel_init=trunc_normal_init(),
                                     name="head")(pooled)
        return out

    @property
    def num_features(self) -> int:
        return self.embed_dim * (2 ** (len(self.depths) - 1))


def build_swin(name: str, num_classes: int = 0,
               drop_path_rate: float = 0.1, dropout: float = 0.0,
               dtype: jnp.dtype = jnp.float32) -> SwinTransformer:
    if name not in VARIANTS:
        raise ValueError(f"unknown swin variant {name!r}; one of {list(VARIANTS)}")
    cfg = VARIANTS[name]
    return SwinTransformer(num_classes=num_classes,
                           drop_path_rate=drop_path_rate, dropout=dropout,
                           dtype=dtype, **cfg)


def swin_feature_dim(name: str) -> int:
    cfg = VARIANTS[name]
    return cfg["embed_dim"] * (2 ** (len(cfg["depths"]) - 1))
