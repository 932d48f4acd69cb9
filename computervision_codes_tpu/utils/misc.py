"""Small utilities mirroring the reference's vendored Q2L utils (M22).

The reference vendors ~1.3k LoC of mostly-unused helpers
(MT4MTLKD/Spatial_transformer/utils/: misc.py DDP helpers, cutout.py,
metric.py voc_mAP, slconfig/slio). The pieces with live semantics are
re-provided here natively:

  * ``clean_state_dict`` — the only used misc.py function (:392);
  * ``ModelEma`` — functional EMA of a parameter tree (network.py:207-232);
  * ``cutout`` / ``CutoutPIL`` — random-erasing augmentation (cutout.py);
  * ``voc_mAP`` — the Q2L-style global AP (utils/metric.py);
  * config loading — plain yaml/json into a dot-accessible namespace
    (replaces the vendored mmcv-style SLConfig; only ever used to load the
    CvT yaml configs, cls_cvt.py:18).

The reference's NCCL ``init_distributed_mode``/``all_gather`` have no
translation — multi-chip runs through jax.sharding (parallel/mesh.py).
"""

from __future__ import annotations

import json
from types import SimpleNamespace
from typing import Dict

import jax
import numpy as np


def clean_state_dict(state_dict: Dict) -> Dict:
    """Strip 'module.' prefixes from (torch) checkpoint keys."""
    return {(k[7:] if k.startswith("module.") else k): v
            for k, v in state_dict.items()}


class ModelEma:
    """Exponential moving average of a parameter pytree."""

    def __init__(self, params, decay: float = 0.9997):
        self.decay = decay
        self.params = jax.tree.map(lambda x: x, params)

    def update(self, params):
        d = self.decay
        self.params = jax.tree.map(lambda e, p: e * d + p * (1.0 - d),
                                   self.params, params)
        return self.params

    def set(self, params):
        self.params = jax.tree.map(lambda x: x, params)
        return self.params


def cutout(rng: np.random.Generator, image: np.ndarray,
           factor: float = 0.5) -> np.ndarray:
    """Random-erase a rectangle with random color (reference CutoutPIL)."""
    h, w = image.shape[:2]
    ch = int(rng.uniform(0, factor) * h)
    cw = int(rng.uniform(0, factor) * w)
    if ch == 0 or cw == 0:
        return image
    y = int(rng.integers(0, h - ch + 1))
    x = int(rng.integers(0, w - cw + 1))
    out = image.copy()
    out[y:y + ch, x:x + cw] = rng.integers(0, 256, size=(1, 1, image.shape[2]))
    return out


def voc_mAP(scores: np.ndarray, targets: np.ndarray) -> float:
    """Global (non-video-wise) mAP over concatenated frames (Q2L metric.py)."""
    from ..metrics.recognition import classwise_ap

    ap = classwise_ap(targets, scores)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", RuntimeWarning)
        return float(np.nanmean(ap))


def load_config(path: str) -> SimpleNamespace:
    """Load a yaml/json config file into a dot-accessible namespace."""
    if path.endswith((".yaml", ".yml")):
        import yaml

        with open(path) as f:
            data = yaml.safe_load(f)
    else:
        with open(path) as f:
            data = json.load(f)

    def ns(obj):
        if isinstance(obj, dict):
            return SimpleNamespace(**{k: ns(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [ns(v) for v in obj]
        return obj

    return ns(data)
