"""ImageNet warm-start: reference pretrained checkpoints -> train state.

The reference initializes every backbone from a local ``../Pretrain`` dir of
official torchvision/microsoft/timm checkpoints
(MT4MTLKD/Spatial_transformer/models/backbone.py:26-41 PTDICT;
Spatial_cnn uses torchvision's bundled resnet weights). This module is the
TPU-side equivalent: resolve the same filenames, run the layout converters
(models/convert.py — each forward-parity-tested against torch/HF), and merge
the backbone subtree into a freshly initialized model's variables with
shape checking.

No network exists in the build container, so the actual .pth files flow
through this path only on a networked TPU-VM — scripts/networked_parity_kit.sh
drives it end to end; tests cover the merge mechanics with synthetic
state_dicts.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

from .convert import (
    convert_cvt,
    convert_swin,
    convert_torchvision_resnet,
    convert_tresnet,
    load_torch_state_dict,
)

# reference PTDICT (backbone.py:26-41) + the torchvision students the
# Spatial_cnn track loads implicitly
PTDICT = {
    "CvT_w24": "CvT-w24-384x384-IN-22k.pth",
    "swin_L_384_22k": "swin_large_patch4_window12_384_22k.pth",
    "swin_B_384_22k": "swin_base_patch4_window12_384_22k.pth",
    "swin_T_224_1k": "swin_tiny_patch4_window7_224.pth",
    "tresnetl": "tresnet_l_448.pth",
    "tresnetxl": "tresnet_xl_448.pth",
    "tresnetl_v2": "tresnet_l_v2_miil_21k.pth",
    # this repo's variant names for the same files
    "tresnet_l": "tresnet_l_448.pth",
    "tresnet_xl": "tresnet_xl_448.pth",
    "cvt_w24": "CvT-w24-384x384-IN-22k.pth",
    "resnet18": "resnet18-f37072fd.pth",
    "resnet34": "resnet34-b627a593.pth",
    "resnet50": "resnet50-0676ba61.pth",
}

# official download sources (documented for the networked kit; the build
# container has no egress)
URLS = {
    "swin_L_384_22k": "https://github.com/SwinTransformer/storage/releases/"
                      "download/v1.0.0/swin_large_patch4_window12_384_22k.pth",
    "swin_B_384_22k": "https://github.com/SwinTransformer/storage/releases/"
                      "download/v1.0.0/swin_base_patch4_window12_384_22k.pth",
    "swin_T_224_1k": "https://github.com/SwinTransformer/storage/releases/"
                     "download/v1.0.0/swin_tiny_patch4_window7_224.pth",
    "resnet18": "https://download.pytorch.org/models/resnet18-f37072fd.pth",
    "resnet34": "https://download.pytorch.org/models/resnet34-b627a593.pth",
    "resnet50": "https://download.pytorch.org/models/resnet50-0676ba61.pth",
}


def resolve_checkpoint(backbone: str, path: str) -> str:
    """``path`` may be the .pth itself or a Pretrain-style directory."""
    if os.path.isdir(path):
        if backbone not in PTDICT:
            raise ValueError(f"no known checkpoint filename for {backbone!r};"
                             " pass the .pth path directly")
        path = os.path.join(path, PTDICT[backbone])
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"pretrained checkpoint not found: {path}"
            + (f" (fetch: {URLS[backbone]})" if backbone in URLS else ""))
    return path


def load_backbone_variables(backbone: str, path: str,
                            frozen_bn: bool = False) -> Dict:
    """Load + convert an official checkpoint into our variables layout."""
    sd = load_torch_state_dict(resolve_checkpoint(backbone, path))
    if backbone.startswith("swin"):
        from .swin import VARIANTS as SWIN_VARIANTS

        return convert_swin(sd, SWIN_VARIANTS[backbone]["depths"])
    if backbone.startswith("resnet"):
        from .resnet import VARIANTS as RESNET_VARIANTS

        return convert_torchvision_resnet(sd, RESNET_VARIANTS[backbone][0],
                                          frozen_bn=frozen_bn)
    if backbone.lower().startswith("cvt"):
        from .cvt import VARIANTS as CVT_VARIANTS

        key = backbone if backbone in CVT_VARIANTS else "cvt_w24"
        return convert_cvt(sd, CVT_VARIANTS[key]["depths"])
    if backbone.startswith("tresnet"):
        from .tresnet import VARIANTS as TR_VARIANTS

        return convert_tresnet(sd, TR_VARIANTS[backbone]["layers"])
    raise ValueError(f"no converter for backbone {backbone!r}")


def _merge(dst: Dict, src: Dict, path: str = "") -> Tuple[Dict, list, list]:
    """Replace dst leaves with src leaves where key paths + shapes match.

    Returns (merged, loaded_paths, skipped_paths). Keys present in src but
    absent in dst (e.g. the ImageNet classification head on a headless
    backbone) are skipped; a shape mismatch is an error (wrong variant).
    """
    merged = dict(dst)
    loaded, skipped = [], []
    for k, v in src.items():
        p = f"{path}/{k}"
        if k not in dst:
            skipped.append(p)
            continue
        if isinstance(v, dict):
            sub, ld, sk = _merge(dst[k], v, p)
            merged[k] = sub
            loaded += ld
            skipped += sk
        else:
            want = np.shape(dst[k])
            got = np.shape(v)
            if want != got:
                raise ValueError(f"shape mismatch at {p}: checkpoint {got} "
                                 f"vs model {want} — wrong variant?")
            merged[k] = np.asarray(v, dtype=np.asarray(dst[k]).dtype)
            loaded.append(p)
    return merged, loaded, skipped


def warm_start_backbone(state, backbone: str, path: str,
                        submodule: str = "backbone",
                        frozen_bn: Optional[bool] = None,
                        log=print):
    """Return ``state`` with its ``submodule`` params (and BN collections)
    replaced by the converted ImageNet checkpoint.

    ``submodule`` is a '/'-separated path into each collection (plain
    drivers: "backbone"; TERL nests it at "encoder/backbone").
    ``frozen_bn`` defaults from what the model actually owns: a ``frozen``
    collection containing the submodule means FrozenBatchNorm (the Q2L
    teacher's resnet path), else live batch_stats (the CNN student).
    """
    keys = submodule.split("/")

    def lookup(col):
        node = col
        for k in keys:
            if not isinstance(node, dict) or k not in node:
                return None
            node = node[k]
        return node

    def replace_at(col, new_sub):
        out = node = dict(col)
        for k in keys[:-1]:
            node[k] = dict(node[k])
            node = node[k]
        node[keys[-1]] = new_sub
        return out

    state_frozen = getattr(state, "frozen", None)
    state_stats = getattr(state, "batch_stats", None)
    if frozen_bn is None:
        frozen_bn = bool(state_frozen) and lookup(state_frozen) is not None
    src = load_backbone_variables(backbone, path, frozen_bn=frozen_bn)

    total_loaded, total_skipped = [], []

    def merge_col(dst_col, col_name):
        if dst_col is None or col_name not in src:
            return dst_col
        target = lookup(dst_col)
        if target is None:
            return dst_col
        merged, ld, sk = _merge(target, src[col_name],
                                f"{col_name}/{submodule}")
        total_loaded.extend(ld)
        total_skipped.extend(sk)
        return replace_at(dst_col, merged)

    replace_kwargs = {"params": merge_col(state.params, "params")}
    if state_stats is not None:
        replace_kwargs["batch_stats"] = merge_col(state_stats, "batch_stats")
    if state_frozen is not None:
        replace_kwargs["frozen"] = merge_col(state_frozen, "frozen")
    if not total_loaded:
        raise ValueError(f"warm start loaded nothing: submodule "
                         f"{submodule!r} not found or empty")
    msg = (f"warm-started {submodule} from {os.path.basename(path)}: "
           f"{len(total_loaded)} tensors loaded")
    if total_skipped:
        msg += (f", {len(total_skipped)} checkpoint keys skipped "
                f"(e.g. {total_skipped[:3]})")
    log(msg)
    return state.replace(**replace_kwargs)
