"""Class-activation-map visualization (TERL cam.py equivalent).

Parity target: TERL/6_baseline_learnT/cam.py:200-278 (forward-hook CAM
extraction + cv2 JET overlay). Here CAMs are explicit model outputs
(MoCoEncoder returns per-task CAM maps — no hooks needed), so this module
only does the rendering: normalize a CAM, resize to the frame, apply a JET
colormap, and alpha-blend onto the original image.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def normalize_cam(cam: np.ndarray) -> np.ndarray:
    """Min-max normalize a (h, w) activation map to [0, 1]."""
    cam = np.asarray(cam, np.float32)
    lo, hi = float(cam.min()), float(cam.max())
    if hi - lo < 1e-12:
        return np.zeros_like(cam)
    return (cam - lo) / (hi - lo)


def render_cam_overlay(image: np.ndarray, cam: np.ndarray,
                       alpha: float = 0.4) -> np.ndarray:
    """Blend a JET-colored CAM over an RGB uint8 image (H, W, 3)."""
    import cv2

    h, w = image.shape[:2]
    heat = np.uint8(255 * normalize_cam(cam))
    heat = cv2.resize(heat, (w, h))
    heat = cv2.applyColorMap(heat, cv2.COLORMAP_JET)
    heat = cv2.cvtColor(heat, cv2.COLOR_BGR2RGB)
    out = (alpha * heat + (1 - alpha) * image).astype(np.uint8)
    return out


def draw_cam(image: np.ndarray, cam: np.ndarray, path: str,
             alpha: float = 0.4) -> str:
    """Render and save a CAM overlay PNG (reference draw_CAM, cam.py:221)."""
    import cv2

    out = render_cam_overlay(image, cam, alpha)
    cv2.imwrite(path, cv2.cvtColor(out, cv2.COLOR_RGB2BGR))
    return path


def denormalize_frame(image: np.ndarray) -> np.ndarray:
    """ImageNet-normalized (H, W, 3) float -> displayable uint8 RGB.

    The eval pipeline hands the model normalized frames; the reference tool
    re-reads the PNG from disk for the overlay base (cam.py:272) — inverting
    the normalization gives the same image without a second decode."""
    from ..data.transforms import IMAGENET_MEAN, IMAGENET_STD

    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    img = (np.asarray(image, np.float32) * std + mean) * 255.0
    return np.clip(img, 0, 255).astype(np.uint8)
