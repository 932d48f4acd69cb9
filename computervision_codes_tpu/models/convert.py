"""Pretrained-weight converters: torch state_dicts -> Flax param trees.

The reference initializes every backbone from torchvision/timm ImageNet
checkpoints (Spatial_transformer/models/backbone.py:26-41,118,193; SURVEY.md
§7 hard parts). These converters map those state_dict layouts onto the
modules in models/resnet.py and models/swin.py so published checkpoints can
be loaded without torch at runtime (tensors come in as numpy arrays; use
``load_torch_state_dict`` to read a .pth with torch available).

Layout rules:
  * conv OIHW -> HWIO; linear (out, in) -> (in, out);
  * BatchNorm weight/bias -> params.scale/bias, running stats ->
    batch_stats.mean/var (or the 'frozen' collection for FrozenBatchNorm);
  * Swin qkv packed (3C, C) -> one Dense kernel (C, 3C);
  * PatchMerging keeps torch's 2x2 concat order (models/swin.py uses the
    same order so the (2C, 4C) reduction weight transposes directly).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
        sd = sd["model"]
    from ..utils.misc import clean_state_dict

    sd = clean_state_dict(sd)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _dense(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _bn(sd: Dict[str, np.ndarray], prefix: str) -> Tuple[Dict, Dict]:
    params = {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}
    stats = {"mean": sd[f"{prefix}.running_mean"],
             "var": sd[f"{prefix}.running_var"]}
    return params, stats


def convert_torchvision_resnet(sd: Dict[str, np.ndarray],
                               stage_sizes,
                               frozen_bn: bool = False) -> Dict:
    """torchvision resnet18/34/50/101 state_dict -> our variables dict."""
    params: Dict = {}
    stats: Dict = {}
    frozen: Dict = {}

    def put_bn(name: str, prefix: str):
        p, s = _bn(sd, prefix)
        if frozen_bn:
            frozen[name] = {"scale": p["scale"], "bias": p["bias"],
                            "mean": s["mean"], "var": s["var"]}
        else:
            params[name] = p
            stats[name] = s

    params["conv1"] = {"kernel": _conv(sd["conv1.weight"])}
    put_bn("bn1", "bn1")
    bottleneck = any(k.startswith("layer1.0.conv3") for k in sd)
    n_convs = 3 if bottleneck else 2
    for si, blocks in enumerate(stage_sizes):
        for bi in range(blocks):
            t = f"layer{si + 1}.{bi}"
            name = f"layer{si + 1}_{bi}"
            block: Dict = {}
            for ci in range(1, n_convs + 1):
                block[f"conv{ci}"] = {"kernel": _conv(sd[f"{t}.conv{ci}.weight"])}
            params[name] = block
            for ci in range(1, n_convs + 1):
                put_bn_block(name, f"bn{ci}", f"{t}.bn{ci}",
                             params, stats, frozen, sd, frozen_bn)
            if f"{t}.downsample.0.weight" in sd:
                params[name]["downsample_conv"] = {
                    "kernel": _conv(sd[f"{t}.downsample.0.weight"])}
                put_bn_block(name, "downsample_bn", f"{t}.downsample.1",
                             params, stats, frozen, sd, frozen_bn)
    out = {"params": params}
    if frozen_bn:
        # merge nested frozen entries collected at top level
        out["frozen"] = frozen
    else:
        out["batch_stats"] = stats
    return out


def put_bn_block(block_name: str, bn_name: str, prefix: str, params: Dict,
                 stats: Dict, frozen: Dict, sd: Dict, frozen_bn: bool):
    p, s = _bn(sd, prefix)
    if frozen_bn:
        frozen.setdefault(block_name, {})[bn_name] = {
            "scale": p["scale"], "bias": p["bias"],
            "mean": s["mean"], "var": s["var"]}
    else:
        params.setdefault(block_name, {})[bn_name] = p
        stats.setdefault(block_name, {})[bn_name] = s


def convert_swin(sd: Dict[str, np.ndarray], depths,
                 with_head: bool = False) -> Dict:
    """Official microsoft/timm Swin state_dict -> our variables dict.

    Handles the layout of the checkpoints the reference loads
    (swin_{T,B,L}_{224,384}_*.pth: keys patch_embed.*, layers.{s}.blocks.{b}
    .{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2},
    layers.{s}.downsample.{norm,reduction}, norm, head).
    """
    params: Dict = {}
    params["patch_embed"] = {"kernel": _conv(sd["patch_embed.proj.weight"]),
                             "bias": sd["patch_embed.proj.bias"]}
    if "patch_embed.norm.weight" in sd:
        params["patch_norm"] = {"scale": sd["patch_embed.norm.weight"],
                                "bias": sd["patch_embed.norm.bias"]}
    for si, depth in enumerate(depths):
        for bi in range(depth):
            t = f"layers.{si}.blocks.{bi}"
            name = f"stage{si}_block{bi}"
            blk: Dict = {
                "norm1": {"scale": sd[f"{t}.norm1.weight"],
                          "bias": sd[f"{t}.norm1.bias"]},
                "norm2": {"scale": sd[f"{t}.norm2.weight"],
                          "bias": sd[f"{t}.norm2.bias"]},
                "attn": {
                    "qkv": {"kernel": _dense(sd[f"{t}.attn.qkv.weight"]),
                            "bias": sd[f"{t}.attn.qkv.bias"]},
                    "proj": {"kernel": _dense(sd[f"{t}.attn.proj.weight"]),
                             "bias": sd[f"{t}.attn.proj.bias"]},
                    "relative_position_bias_table":
                        sd[f"{t}.attn.relative_position_bias_table"],
                },
                "mlp": {
                    "Dense_0": {"kernel": _dense(sd[f"{t}.mlp.fc1.weight"]),
                                "bias": sd[f"{t}.mlp.fc1.bias"]},
                    "Dense_1": {"kernel": _dense(sd[f"{t}.mlp.fc2.weight"]),
                                "bias": sd[f"{t}.mlp.fc2.bias"]},
                },
            }
            params[name] = blk
        if si < len(depths) - 1:
            d = f"layers.{si}.downsample"
            params[f"merge{si}"] = {
                "norm": {"scale": sd[f"{d}.norm.weight"],
                         "bias": sd[f"{d}.norm.bias"]},
                "reduction": {"kernel": _dense(sd[f"{d}.reduction.weight"])},
            }
    params["norm"] = {"scale": sd["norm.weight"], "bias": sd["norm.bias"]}
    if with_head and "head.weight" in sd:
        params["head"] = {"kernel": _dense(sd["head.weight"]),
                          "bias": sd["head.bias"]}
    return {"params": params}
