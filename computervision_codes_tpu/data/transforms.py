"""Host-side image transforms (PIL/numpy) with reference-parity semantics.

Reference pipeline (MT4MTLKD/Spatial_cnn/dataloader.py:89-97,153-162):
  Resize(256,448) -> [augs] -> Resize(256,448) -> ToTensor -> ImageNet norm.

Augs and probabilities: vflip p=0.4, hflip p=0.4, 'contrast', rot90 =
uniform(-90,90) rotation with expansion. NOTE the reference's augmentation
dict declares ColorJitter under key 'contrast' and then *overwrites* the
same key with RandomAutocontrast(p=0.5) (dataloader.py:93,96) — so the
effective 'contrast' aug is autocontrast, not jitter. We reproduce the
effective behavior and keep 'jitter' available as an explicit opt-in.

TERL uses a square img_size resize instead (TERL/6_baseline_learnT/
dataloader.py:155-158) — pass size=(s, s).

Output is float32 NHWC (TPU layout), ImageNet-normalized.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
from PIL import Image, ImageOps

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

DEFAULT_SIZE = (256, 448)  # (H, W)
DEFAULT_AUGS = ("original", "vflip", "hflip", "contrast", "rot90")


def _resize(img: Image.Image, size: Tuple[int, int]) -> Image.Image:
    h, w = size
    return img.resize((w, h), Image.BILINEAR)


def _autocontrast(img: Image.Image) -> Image.Image:
    return ImageOps.autocontrast(img)


def _color_jitter(rng: np.random.Generator, img: Image.Image,
                  brightness: float = 0.1, contrast: float = 0.2) -> Image.Image:
    from PIL import ImageEnhance

    b = 1.0 + rng.uniform(-brightness, brightness)
    c = 1.0 + rng.uniform(-contrast, contrast)
    img = ImageEnhance.Brightness(img).enhance(b)
    return ImageEnhance.Contrast(img).enhance(c)


def apply_augmentations(rng: np.random.Generator, img: Image.Image,
                        augmentation_list: Sequence[str]) -> Image.Image:
    for aug in augmentation_list:
        if aug == "original":
            continue
        if aug == "vflip":
            if rng.random() < 0.4:
                img = img.transpose(Image.FLIP_TOP_BOTTOM)
        elif aug == "hflip":
            if rng.random() < 0.4:
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
        elif aug == "contrast":
            if rng.random() < 0.5:
                img = _autocontrast(img)
        elif aug == "jitter":
            img = _color_jitter(rng, img)
        elif aug == "rot90":
            angle = rng.uniform(-90.0, 90.0)
            img = img.rotate(angle, expand=True)
        elif aug == "brightness":
            if rng.random() < 0.5:
                from PIL import ImageEnhance

                img = ImageEnhance.Sharpness(img).enhance(1.6)
        else:
            raise ValueError(f"unknown augmentation {aug!r}")
    return img


def to_normalized_array(img: Image.Image) -> np.ndarray:
    arr = np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


def train_transform(rng: np.random.Generator, img: Image.Image,
                    size: Tuple[int, int] = DEFAULT_SIZE,
                    augmentation_list: Sequence[str] = DEFAULT_AUGS) -> np.ndarray:
    img = _resize(img, size)
    img = apply_augmentations(rng, img, augmentation_list)
    img = _resize(img, size)
    return to_normalized_array(img)


def eval_transform(img: Image.Image,
                   size: Tuple[int, int] = DEFAULT_SIZE) -> np.ndarray:
    return to_normalized_array(_resize(img, size))


def raw_resize_u8(img: Image.Image,
                  size: Tuple[int, int] = DEFAULT_SIZE) -> np.ndarray:
    """Resize only -> (H, W, 3) uint8: the host half of the device-side
    augmentation split (data/device_augment.py) — augs + normalization
    run on-chip, the host ships 4x less than f32."""
    return np.asarray(_resize(img, size).convert("RGB"), dtype=np.uint8)
