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


def _warp_pass_bounds(hs, ws, h, w, th_lo, th_hi):
    """Static (python) worst-case geometry bounds for the two-pass warp
    over rotation angles [th_lo, th_hi] U [-th_hi, -th_lo] degrees:
    pass-1 resample width U1, line-shift pad P1, and the pass-2 pair.
    Evaluated on a dense angle grid with numpy at trace time — the
    resulting ints are static shapes."""
    import numpy as np

    th = np.deg2rad(np.concatenate([
        np.linspace(th_lo, th_hi, 721), np.linspace(-th_hi, -th_lo, 721)]))
    ca, sa = np.cos(th), np.sin(th)
    we = np.abs(ws * ca) + np.abs(hs * sa)
    he = np.abs(ws * sa) + np.abs(hs * ca)
    u0 = 0.5 * we / w - 0.5 - (we - 1) / 2.0
    v0 = 0.5 * he / h - 0.5 - (he - 1) / 2.0
    a = ca * we / w
    b = -sa * he / h
    c = ca * u0 - sa * v0 + (ws - 1) / 2.0
    d = sa * we / w
    e = ca * he / h
    f = sa * u0 + ca * v0 + (hs - 1) / 2.0
    al1 = (a * e - b * d) / e
    be1 = b / e
    ga1 = c - b * f / e
    off1 = np.minimum(0.0, al1 * (w - 1))
    U1 = int(np.ceil(np.abs(al1 * (w - 1)).max())) + 2
    d1 = np.concatenate([ga1 + off1, be1 * (hs - 1) + ga1 + off1])
    P1 = int(np.ceil(max(-d1.min(), d1.max() + U1 - ws, 1.0))) + 2
    off2 = np.minimum(0.0, e * (h - 1))
    U2 = int(np.ceil(np.abs(e * (h - 1)).max())) + 2
    d2 = np.concatenate([f + off2, d * (w - 1) + f + off2])
    P2 = int(np.ceil(max(-d2.min(), d2.max() + U2 - hs, 1.0))) + 2
    return U1, P1, U2, P2


def _line_shift(lines: jnp.ndarray, delta: jnp.ndarray, span: int,
                pad: int) -> jnp.ndarray:
    """lines (B, L, S, C) -> (B, L, span, C) with out[b,l,u] =
    lines[b, l, u + delta[b,l]] (bilinear along the 3rd axis, zeros
    outside). The per-line fractional shift is two taps of one
    dynamic-slice — a contiguous-row gather the TPU DMAs efficiently,
    unlike the per-pixel 2-D gather it replaces."""
    b, l, s, c = lines.shape
    padded = jnp.pad(lines, ((0, 0), (0, 0), (pad, pad), (0, 0)))
    k = jnp.floor(delta)
    frac = (delta - k)[..., None, None].astype(jnp.float32)
    start = jnp.clip(k.astype(jnp.int32) + pad, 0, s + 2 * pad - span - 1)

    def one(line, st):
        return jax.lax.dynamic_slice(line, (st, 0), (span + 1, c))

    sl = jax.vmap(jax.vmap(one))(padded, start).astype(jnp.float32)
    return sl[:, :, :span] * (1 - frac) + sl[:, :, 1:] * frac


def _scale_lines(t: jnp.ndarray, alpha: jnp.ndarray, off: jnp.ndarray,
                 n_out: int) -> jnp.ndarray:
    """t (B, L, U, C) -> (B, L, n_out, C): per-sample 1-D resample at
    positions alpha*x - off via a dense bilinear-hat matrix — one bf16
    GEMM on the MXU instead of a gather (pixel values <= 255 are exact
    in bf16; hat weights round within ~1 uint8 level)."""
    b, l, u, c = t.shape
    x = jnp.arange(n_out, dtype=jnp.float32)
    q = alpha[:, None] * x[None, :] - off[:, None]          # (B, n_out)
    ui = jnp.arange(u, dtype=jnp.float32)
    hat = jnp.maximum(0.0, 1.0 - jnp.abs(ui[None, :, None] - q[:, None, :]))
    # bf16 GEMM on the MXU (u8 pixels <= 255 are bf16-exact); the CPU
    # backend lacks bf16xbf16->f32 dots, so tests run the f32 GEMM
    gd = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    return jnp.einsum("bluc,bux->blxc", t.astype(gd), hat.astype(gd),
                      preferred_element_type=jnp.float32)


def _two_pass_warp(src: jnp.ndarray, coeffs, h: int, w: int,
                   bounds) -> jnp.ndarray:
    """out[b,y,x] = src[b, d x + e y + f, a x + b_ y + c] (bilinear,
    zeros outside) via the Catmull-Smith two-pass decomposition:
    horizontal resample tmp[v,x] = src[v, al1 x + be1 v + ga1], then
    vertical out[y,x] = tmp[e y + (d x + f), x]. Each pass = per-line
    shift (+ fractional blend) + per-sample scale GEMM. Valid while
    |e| stays away from 0 (callers split |angle|<=45 / >45 branches)."""
    a, b_, c, d, e, f = coeffs
    bsz, hs, ws, ch = src.shape
    U1, P1, U2, P2 = bounds
    al1 = (a * e - b_ * d) / e
    be1 = b_ / e
    ga1 = c - b_ * f / e
    off1 = jnp.minimum(0.0, al1 * (w - 1))
    v = jnp.arange(hs, dtype=jnp.float32)
    t1 = _line_shift(src, be1[:, None] * v[None, :] + (ga1 + off1)[:, None],
                     U1, P1)                        # (B, hs, U1, C)
    tmp = _scale_lines(t1, al1, off1, w)            # (B, hs, w, C)
    off2 = jnp.minimum(0.0, e * (h - 1))
    xs = jnp.arange(w, dtype=jnp.float32)
    cols = tmp.transpose(0, 2, 1, 3)                # (B, w, hs, C)
    t2 = _line_shift(cols, d[:, None] * xs[None, :] + (f + off2)[:, None],
                     U2, P2)                        # (B, w, U2, C)
    out = _scale_lines(t2, e, off2, h)              # (B, w, h, C)
    return out.transpose(0, 2, 1, 3)                # (B, h, w, C)


def _rotate_coeffs(ca, sa, hs, ws, h, w):
    """Affine (output pixel -> source pixel) for rotate(angle,
    expand=True) + Resize((h, w)) — the same map rotate_expand_resize_u8
    evaluates pointwise."""
    we = jnp.abs(ws * ca) + jnp.abs(hs * sa)
    he = jnp.abs(ws * sa) + jnp.abs(hs * ca)
    u0 = 0.5 * we / w - 0.5 - (we - 1) / 2.0
    v0 = 0.5 * he / h - 0.5 - (he - 1) / 2.0
    a = ca * we / w
    b_ = -sa * he / h
    c = ca * u0 - sa * v0 + (ws - 1) / 2.0
    d = sa * we / w
    e = ca * he / h
    f = sa * u0 + ca * v0 + (hs - 1) / 2.0
    return a, b_, c, d, e, f


def rotate_expand_resize_fast(x: jnp.ndarray,
                              angles_deg: jnp.ndarray) -> jnp.ndarray:
    """TPU-native rotate+expand+resize: same map as
    rotate_expand_resize_u8 but built from contiguous-slice shifts and
    MXU GEMMs instead of a per-pixel 2-D gather (measured 142.8 fps for
    the gather warp on v5e — the gathers serialize). Double bilinear
    (shift then scale) differs from single-pass bilinear by <~1 uint8
    level on smooth content; angle 0 is exact.

    |angle| <= 45 runs on the source directly; larger angles run on the
    rot90'd source with the affine re-expressed (xi' = yi,
    yi' = ws-1-xi), keeping both passes well-conditioned (|e| >= cos45).
    Both branches are computed and selected per sample.
    """
    b, h, w, _ = x.shape
    a_rad = jnp.deg2rad(angles_deg.astype(jnp.float32))
    ca, sa = jnp.cos(a_rad), jnp.sin(a_rad)

    cA = _rotate_coeffs(ca, sa, h, w, h, w)
    bA = _warp_pass_bounds(h, w, h, w, 0.0, 46.0)
    outA = _two_pass_warp(x, cA, h, w, bA)

    xr = jnp.rot90(x, k=1, axes=(1, 2))             # (B, w, h, C)
    a2, b2, c2, d2, e2, f2 = cA
    # src'[i, j] = src[j, ws-1-i]  =>  col' = yi, row' = ws-1-xi
    cB = (d2, e2, f2, -a2, -b2, (w - 1) - c2)
    import numpy as _np

    def _boundsB(hs, ws, h_, w_, lo, hi):
        # same grid evaluation but for the rot90 branch's coefficient
        # transform; reuse _warp_pass_bounds by evaluating the original
        # coefficients and mapping them
        th = _np.deg2rad(_np.concatenate([
            _np.linspace(lo, hi, 721), _np.linspace(-hi, -lo, 721)]))
        can, san = _np.cos(th), _np.sin(th)
        we = _np.abs(w_ * can) + _np.abs(h_ * san)
        he = _np.abs(w_ * san) + _np.abs(h_ * can)
        u0 = 0.5 * we / w_ - 0.5 - (we - 1) / 2.0
        v0 = 0.5 * he / h_ - 0.5 - (he - 1) / 2.0
        a = can * we / w_
        bb = -san * he / h_
        cc = can * u0 - san * v0 + (w_ - 1) / 2.0
        d = san * we / w_
        e = can * he / h_
        ff = san * u0 + can * v0 + (h_ - 1) / 2.0
        aB, bB, cCB = d, e, ff
        dB, eB, fB = -a, -bb, (w_ - 1) - cc
        al1 = (aB * eB - bB * dB) / eB
        be1 = bB / eB
        ga1 = cCB - bB * fB / eB
        off1 = _np.minimum(0.0, al1 * (w_ - 1))
        U1 = int(_np.ceil(_np.abs(al1 * (w_ - 1)).max())) + 2
        d1 = _np.concatenate([ga1 + off1, be1 * (hs - 1) + ga1 + off1])
        P1 = int(_np.ceil(max(-d1.min(), d1.max() + U1 - ws, 1.0))) + 2
        off2 = _np.minimum(0.0, eB * (h_ - 1))
        U2 = int(_np.ceil(_np.abs(eB * (h_ - 1)).max())) + 2
        d2_ = _np.concatenate([fB + off2, dB * (w_ - 1) + fB + off2])
        P2 = int(_np.ceil(max(-d2_.min(), d2_.max() + U2 - hs, 1.0))) + 2
        return U1, P1, U2, P2

    bB = _boundsB(w, h, h, w, 44.0, 90.0)
    outB = _two_pass_warp(xr, cB, h, w, bB)

    out = jnp.where((jnp.abs(angles_deg) <= 45.0)[:, None, None, None],
                    outA, outB)
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
                        dtype=jnp.float32, two_view: bool = False,
                        rot_impl: str = "two_pass"):
    """Jittable ``(key, uint8 (B,H,W,3)) -> normalized (B,H,W,3) dtype``
    applying the reference's train augmentations in list order
    (transforms.py:52-78 semantics; probabilities per sample).
    ``two_view=True`` returns two independently-augmented views of the
    same batch (the TERL two-crop protocol) from one uint8 upload.
    ``rot_impl``: "two_pass" (default — shift+GEMM warp, TPU-native;
    271.6 fps for the full reference list at b=128) or "gather"
    (single-pass bilinear reference warp; pathological on TPU: 142.8
    fps). Measured side by side on-chip round 5 (docs/BENCH.md): the
    two-pass warp doubles the gather but rotation-bearing lists still
    belong host-side; flip/contrast lists are free (68k+ fps)."""
    augs = tuple(augmentation_list)
    rot_fn = {"two_pass": rotate_expand_resize_fast,
              "gather": rotate_expand_resize_u8}[rot_impl]
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
                x = rot_fn(x, ang)
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
