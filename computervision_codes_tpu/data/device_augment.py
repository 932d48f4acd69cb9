"""Device-side (on-TPU) train-time augmentation over uint8 frames.

The reference augments on the host with PIL inside the torch DataLoader
(MT4MTLKD/Spatial_cnn/dataloader.py:89-97: vflip p=0.4, hflip p=0.4,
'contrast' = RandomAutocontrast p=0.5 via the dict-overwrite quirk, and a
uniform(-90°,90°) expand-rotation, all between two Resize(256,448) calls).
At TPU serving/training rates the host is the bottleneck (docs/ROADMAP.md:
PNG decode alone needs ~80-600 cores/chip), so this module moves the whole
augment + normalize stage into the jitted step:

  * the host/native plane only decodes + resizes to the target geometry
    and ships **uint8** (4x less host->device traffic than f32);
  * flips are exact selects; autocontrast reproduces PIL's per-channel
    lut within <=1 uint8 level (PIL truncates a float64 lut; we compute
    the same ramp in f32 directly on the pixels);
  * the rotate+expand+resize-back composition collapses into ONE bilinear
    affine warp at the fixed output shape — no dynamic canvas; PIL's
    NEAREST rotate is upgraded to bilinear (a quality improvement, tested
    close on smooth content);
  * ImageNet normalization runs on device in f32, exactly as
    data/transforms.py:to_normalized_array.

Per-sample randomness comes from splitting the step's PRNG key, so the
whole batch augments inside one jitted program (vmap-free batched ops,
MXU/VPU-friendly). `make_device_augment` returns a jittable
``(key, uint8 batch) -> normalized float batch`` closure; drivers opt in
with ``--device_augment`` (the pipeline then skips host-side PIL work).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from .transforms import DEFAULT_AUGS, IMAGENET_MEAN, IMAGENET_STD


def normalize_u8(x: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """uint8 (…, 3) -> ImageNet-normalized float (transforms.py:81-84)."""
    f = x.astype(jnp.float32) / 255.0
    f = (f - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    return f.astype(dtype)


def autocontrast_u8(x: jnp.ndarray) -> jnp.ndarray:
    """PIL ImageOps.autocontrast(cutoff=0) on a uint8 batch (B, H, W, 3).

    PIL builds ``lut[ix] = int(ix*scale + offset)`` per channel with
    ``scale = 255/(hi-lo)``; the same ramp applied to the pixel values
    directly, truncated, matches within <=1 level (f32 vs f64 rounding).
    Channels with hi == lo are left unchanged, as in PIL.
    """
    f = x.astype(jnp.float32)
    lo = jnp.min(f, axis=(1, 2), keepdims=True)
    hi = jnp.max(f, axis=(1, 2), keepdims=True)
    flat = hi <= lo
    scale = 255.0 / jnp.where(flat, 1.0, hi - lo)
    y = jnp.clip(jnp.trunc((f - lo) * scale), 0.0, 255.0)
    return jnp.where(flat, f, y).astype(jnp.uint8)


def _bilinear_sample(img: jnp.ndarray, yi: jnp.ndarray,
                     xi: jnp.ndarray) -> jnp.ndarray:
    """Sample (B, H, W, C) at float coords (B, Ho, Wo); zeros outside."""
    b, h, w, c = img.shape
    y0 = jnp.floor(yi)
    x0 = jnp.floor(xi)
    wy = (yi - y0)[..., None]
    wx = (xi - x0)[..., None]
    f = img.astype(jnp.float32)

    def tap(yy, xx):
        valid = ((yy >= 0) & (yy <= h - 1) & (xx >= 0) & (xx <= w - 1))
        yc = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        batch = jnp.arange(b)[:, None, None]
        return f[batch, yc, xc] * valid[..., None]

    top = tap(y0, x0) * (1 - wx) + tap(y0, x0 + 1) * wx
    bot = tap(y0 + 1, x0) * (1 - wx) + tap(y0 + 1, x0 + 1) * wx
    return top * (1 - wy) + bot * wy


def rotate_expand_resize_u8(x: jnp.ndarray,
                            angles_deg: jnp.ndarray) -> jnp.ndarray:
    """Per-sample rotation with expansion, resized back to the input shape
    — the reference's ``img.rotate(angle, expand=True)`` followed by its
    second ``Resize`` (dataloader.py:153-162), fused into one bilinear
    warp at static shape. Black (zero) fill outside the source, like PIL.
    """
    b, h, w, _ = x.shape
    a = jnp.deg2rad(angles_deg.astype(jnp.float32)).reshape(b, 1, 1)
    ca, sa = jnp.cos(a), jnp.sin(a)
    # expanded canvas size (dynamic scalars, never a shape)
    we = jnp.abs(w * ca) + jnp.abs(h * sa)
    he = jnp.abs(w * sa) + jnp.abs(h * ca)
    yo, xo = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    # resize-back mapping: output pixel centers -> canvas coords
    xc = (xo[None] + 0.5) * (we / w) - 0.5 - (we - 1) / 2.0
    yc = (yo[None] + 0.5) * (he / h) - 0.5 - (he - 1) / 2.0
    # inverse rotation about the centers (canvas -> source); PIL's
    # positive angle is counterclockwise
    xi = ca * xc - sa * yc + (w - 1) / 2.0
    yi = sa * xc + ca * yc + (h - 1) / 2.0
    out = _bilinear_sample(x, yi, xi)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def sharpness_u8(x: jnp.ndarray, factor: float = 1.6) -> jnp.ndarray:
    """PIL ImageEnhance.Sharpness on a uint8 batch: blend toward the SMOOTH
    filter (3x3 ((1,1,1),(1,5,1),(1,1,1))/13; the 1-px border stays
    unfiltered, as PIL's kernel filter skips it). The reference's
    'brightness' aug is this quirk at factor 1.6 (transforms.py:71-75)."""
    f = x.astype(jnp.float32)
    k = jnp.asarray([[1., 1., 1.], [1., 5., 1.], [1., 1., 1.]]) / 13.0
    smooth = jax.lax.conv_general_dilated(
        jnp.moveaxis(f, -1, 1).reshape(-1, 1, *x.shape[1:3]),
        k[None, None], (1, 1), "SAME")
    smooth = jnp.moveaxis(
        smooth.reshape(x.shape[0], 3, *x.shape[1:3]), 1, -1)
    # PIL rounds the filtered degenerate image to uint8 BEFORE blending
    smooth = jnp.clip(jnp.floor(smooth + 0.5), 0, 255)
    out = smooth + factor * (f - smooth)
    out = jnp.clip(jnp.floor(out + 0.5), 0, 255)
    # border: PIL's ImageFilter leaves the outer pixel ring unprocessed
    hb, wb = x.shape[1], x.shape[2]
    ymask = (jnp.arange(hb) > 0) & (jnp.arange(hb) < hb - 1)
    xmask = (jnp.arange(wb) > 0) & (jnp.arange(wb) < wb - 1)
    interior = (ymask[:, None] & xmask[None, :])[None, :, :, None]
    return jnp.where(interior, out, f).astype(jnp.uint8)


def jitter_u8(x: jnp.ndarray, brightness: jnp.ndarray,
              contrast: jnp.ndarray) -> jnp.ndarray:
    """PIL-parity color jitter on a uint8 batch: ImageEnhance.Brightness
    (blend toward black) then .Contrast (blend toward the rounded mean of
    the ITU-R 601-2 L conversion), per-sample factors (B,)-shaped —
    transforms.py:_color_jitter semantics within <=1 level."""
    f = x.astype(jnp.float32)
    b = brightness.reshape(-1, 1, 1, 1).astype(jnp.float32)
    c = contrast.reshape(-1, 1, 1, 1).astype(jnp.float32)
    # Brightness: blend(black, img, b) — PIL's C blend TRUNCATES the float
    # result toward zero ((UINT8) cast), it does not round
    f = jnp.clip(jnp.trunc(f * b), 0, 255)
    # Contrast: PIL's L lut is (r*19595 + g*38470 + b*7471 + 0x8000) >> 16;
    # the blend target is the L mean rounded half-up (int(mean + 0.5))
    lum = jnp.floor((f[..., 0] * 19595 + f[..., 1] * 38470
                     + f[..., 2] * 7471 + 32768) / 65536.0)
    mean = jnp.floor(jnp.mean(lum, axis=(1, 2), keepdims=True) + 0.5)
    out = mean[..., None] + c * (f - mean[..., None])
    return jnp.clip(jnp.trunc(out), 0, 255).astype(jnp.uint8)


def make_device_augment(augmentation_list: Sequence[str] = DEFAULT_AUGS,
                        dtype=jnp.float32, two_view: bool = False):
    """Jittable ``(key, uint8 (B,H,W,3)) -> normalized (B,H,W,3) dtype``
    applying the reference's train augmentations in list order
    (transforms.py:52-78 semantics; probabilities per sample).
    ``two_view=True`` returns two independently-augmented views of the
    same batch (the TERL two-crop protocol) from one uint8 upload."""
    augs = tuple(augmentation_list)
    known = {"original", "vflip", "hflip", "contrast", "rot90",
             "brightness", "jitter"}
    for aug in augs:
        if aug not in known:
            raise ValueError(
                f"unknown/host-only augmentation for the device path: "
                f"{aug!r} (supported: {sorted(known)})")

    def _core(key: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
        b = x.shape[0]
        for aug in augs:
            if aug == "original":
                continue
            key, sub = jax.random.split(key)
            if aug == "vflip":
                m = jax.random.uniform(sub, (b, 1, 1, 1)) < 0.4
                x = jnp.where(m, x[:, ::-1], x)
            elif aug == "hflip":
                m = jax.random.uniform(sub, (b, 1, 1, 1)) < 0.4
                x = jnp.where(m, x[:, :, ::-1], x)
            elif aug == "contrast":
                m = jax.random.uniform(sub, (b, 1, 1, 1)) < 0.5
                x = jnp.where(m, autocontrast_u8(x), x)
            elif aug == "rot90":
                ang = jax.random.uniform(sub, (b,), minval=-90.0,
                                         maxval=90.0)
                x = rotate_expand_resize_u8(x, ang)
            elif aug == "brightness":
                m = jax.random.uniform(sub, (b, 1, 1, 1)) < 0.5
                x = jnp.where(m, sharpness_u8(x), x)
            elif aug == "jitter":
                kb, kc = jax.random.split(sub)
                bf = jax.random.uniform(kb, (b,), minval=0.9, maxval=1.1)
                cf = jax.random.uniform(kc, (b,), minval=0.8, maxval=1.2)
                x = jitter_u8(x, bf, cf)
        return normalize_u8(x, dtype)

    if two_view:
        # TERL two-crop protocol (TERL/6_baseline_learnT/dataloader.py:
        # 101,233-266): two INDEPENDENT augmentations of the same frame
        @partial(jax.jit, static_argnums=())
        def augment2(key: jax.Array, images: jnp.ndarray):
            k1, k2 = jax.random.split(key)
            return _core(k1, images), _core(k2, images)

        return augment2

    @partial(jax.jit, static_argnums=())
    def augment(key: jax.Array, images: jnp.ndarray) -> jnp.ndarray:
        return _core(key, images)

    return augment
