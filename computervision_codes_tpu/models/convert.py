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

    def put_bn(prefix: str, *path: str):
        """Place one BN's tensors under the nested ``path``."""
        p, s = _bn(sd, prefix)
        if frozen_bn:
            dst = frozen
            for key in path[:-1]:
                dst = dst.setdefault(key, {})
            dst[path[-1]] = {**p, **s}
        else:
            for tree, leaf in ((params, p), (stats, s)):
                dst = tree
                for key in path[:-1]:
                    dst = dst.setdefault(key, {})
                dst[path[-1]] = leaf

    params["conv1"] = {"kernel": _conv(sd["conv1.weight"])}
    put_bn("bn1", "bn1")
    bottleneck = any(k.startswith("layer1.0.conv3") for k in sd)
    n_convs = 3 if bottleneck else 2
    for si, blocks in enumerate(stage_sizes):
        for bi in range(blocks):
            t = f"layer{si + 1}.{bi}"
            name = f"layer{si + 1}_{bi}"
            block: Dict = {
                f"conv{ci}": {"kernel": _conv(sd[f"{t}.conv{ci}.weight"])}
                for ci in range(1, n_convs + 1)
            }
            params[name] = block
            for ci in range(1, n_convs + 1):
                put_bn(f"{t}.bn{ci}", name, f"bn{ci}")
            if f"{t}.downsample.0.weight" in sd:
                block["downsample_conv"] = {
                    "kernel": _conv(sd[f"{t}.downsample.0.weight"])}
                put_bn(f"{t}.downsample.1", name, "downsample_bn")
    out = {"params": params}
    if frozen_bn:
        out["frozen"] = frozen
    else:
        out["batch_stats"] = stats
    return out


def convert_tresnet(sd: Dict[str, np.ndarray], layers) -> Dict:
    """Official TResNet checkpoint (tresnet_sync layout: body.conv1,
    body.layer{1-4}.{b}.{conv1,conv2,conv3,se,downsample}) -> variables for
    models/tresnet.py:TResNet.

    InPlaceABN stores weight/bias/running_mean/running_var exactly like
    BatchNorm, so each conv2d_ABN pair maps to (conv kernel, abn.bn).
    Anti-aliased blocks nest the conv under an extra Sequential level
    (conv1.0.0 instead of conv1.0 — tresnet_sync.py:65-66); both forms are
    handled. SE 1x1 convs (C_out, C_in, 1, 1) squeeze to Dense kernels.
    """
    params: Dict = {}
    stats: Dict = {}

    def put_abn(prefix: str, *path):
        p, s = _bn(sd, prefix)
        for tree, leaf in ((params, p), (stats, s)):
            dst = tree
            for key in path:
                dst = dst.setdefault(key, {})
            dst["bn"] = leaf

    def conv_abn(src: str, dst_block: Dict, conv_name: str, abn_path):
        if f"{src}.0.0.weight" in sd:  # Sequential(conv2d_ABN, blur) form
            src = f"{src}.0"
        dst_block[conv_name] = {"kernel": _conv(sd[f"{src}.0.weight"])}
        put_abn(f"{src}.1", *abn_path)

    def se_dense(w: np.ndarray) -> np.ndarray:
        return _dense(w[:, :, 0, 0])  # 1x1 conv acting on pooled vector

    params["stem_conv"] = {"kernel": _conv(sd["body.conv1.0.weight"])}
    put_abn("body.conv1.1", "stem_abn")
    for si, depth in enumerate(layers):
        bottleneck = si >= 2
        for bi in range(depth):
            t = f"body.layer{si + 1}.{bi}"
            name = f"layer{si + 1}_{bi}"
            block: Dict = {}
            params[name] = block
            conv_abn(f"{t}.conv1", block, "conv1", (name, "abn1"))
            conv_abn(f"{t}.conv2", block, "conv2",
                     (name, "abn2"))
            if bottleneck:
                conv_abn(f"{t}.conv3", block, "conv3", (name, "abn3"))
            if f"{t}.se.fc1.weight" in sd:
                block["se"] = {
                    "fc1": {"kernel": se_dense(sd[f"{t}.se.fc1.weight"]),
                            "bias": sd[f"{t}.se.fc1.bias"]},
                    "fc2": {"kernel": se_dense(sd[f"{t}.se.fc2.weight"]),
                            "bias": sd[f"{t}.se.fc2.bias"]},
                }
            # downsample: Sequential([AvgPool,] conv2d_ABN); the conv_abn
            # index is 1 when the pool is present, 0 otherwise
            for di in (1, 0):
                if f"{t}.downsample.{di}.0.weight" in sd:
                    block["downsample"] = {
                        "kernel": _conv(sd[f"{t}.downsample.{di}.0.weight"])}
                    put_abn(f"{t}.downsample.{di}.1", name, "downsample_abn")
                    break
    return {"params": params, "batch_stats": stats}


_HF_CVT_RENAMES = (
    (".embedding.convolution_embeddings.projection.", ".patch_embed.proj."),
    (".embedding.convolution_embeddings.normalization.", ".patch_embed.norm."),
    (".attention.attention.convolution_projection_query.convolution_projection.convolution.",
     ".attn.conv_proj_q.conv."),
    (".attention.attention.convolution_projection_key.convolution_projection.convolution.",
     ".attn.conv_proj_k.conv."),
    (".attention.attention.convolution_projection_value.convolution_projection.convolution.",
     ".attn.conv_proj_v.conv."),
    (".attention.attention.convolution_projection_query.convolution_projection.normalization.",
     ".attn.conv_proj_q.bn."),
    (".attention.attention.convolution_projection_key.convolution_projection.normalization.",
     ".attn.conv_proj_k.bn."),
    (".attention.attention.convolution_projection_value.convolution_projection.normalization.",
     ".attn.conv_proj_v.bn."),
    (".attention.attention.projection_query.", ".attn.proj_q."),
    (".attention.attention.projection_key.", ".attn.proj_k."),
    (".attention.attention.projection_value.", ".attn.proj_v."),
    (".attention.output.dense.", ".attn.proj."),
    (".intermediate.dense.", ".mlp.fc1."),
    (".output.dense.", ".mlp.fc2."),
    (".layernorm_before.", ".norm1."),
    (".layernorm_after.", ".norm2."),
)


def _cvt_canonical(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Normalize an HF CvtModel/CvtForImageClassification state_dict onto
    the official microsoft layout the reference loads
    (Spatial_transformer/models/cls_cvt — keys stage{i}.blocks.{j}.*).
    Official-layout dicts pass through unchanged."""
    if not any(".encoder.stages." in k or k.startswith("encoder.stages.")
               for k in sd):
        return sd
    out = {}
    for k, v in sd.items():
        k = k.removeprefix("cvt.")
        k = k.replace("encoder.stages.", "stage")
        # stage{i}.layers.{j}. -> stage{i}.blocks.{j}.
        k = k.replace(".layers.", ".blocks.")
        for old, new in _HF_CVT_RENAMES:
            k = k.replace(old, new)
        k = k.replace("layernorm.", "norm.")  # CvtForImageClassification
        out[k] = v
    return out


def convert_cvt(sd: Dict[str, np.ndarray], depths) -> Dict:
    """CvT state_dict (official microsoft / reference layout, or HF
    transformers CvtModel) -> variables for models/cvt.py:CvT.

    The reference loads CvT-w24-384x384-IN-22k.pth into its vendored
    cls_cvt modules (Spatial_transformer/models/backbone.py:202-214); this
    maps that layout onto the flax tree: depthwise conv OIHW (C,1,3,3) ->
    HWIO (3,3,1,C), BatchNorm running stats -> batch_stats collection.
    """
    sd = _cvt_canonical(sd)
    params: Dict = {}
    stats: Dict = {}
    for si, depth in enumerate(depths):
        st = f"stage{si}"
        params[f"embed{si}"] = {
            "kernel": _conv(sd[f"{st}.patch_embed.proj.weight"]),
            "bias": sd[f"{st}.patch_embed.proj.bias"]}
        params[f"embed_norm{si}"] = {
            "scale": sd[f"{st}.patch_embed.norm.weight"],
            "bias": sd[f"{st}.patch_embed.norm.bias"]}
        if f"{st}.cls_token" in sd:
            params["cls_token"] = sd[f"{st}.cls_token"]
        for bi in range(depth):
            t = f"{st}.blocks.{bi}"
            attn: Dict = {}
            attn_stats: Dict = {}
            for tk, ours in (("q", "proj_q"), ("k", "proj_k"),
                             ("v", "proj_v")):
                bn_p, bn_s = _bn(sd, f"{t}.attn.conv_proj_{tk}.bn")
                attn[ours] = {
                    "dw": {"kernel": _conv(
                        sd[f"{t}.attn.conv_proj_{tk}.conv.weight"])},
                    "bn": bn_p}
                attn_stats[ours] = {"bn": bn_s}
                attn[tk] = {"kernel": _dense(sd[f"{t}.attn.proj_{tk}.weight"]),
                            "bias": sd[f"{t}.attn.proj_{tk}.bias"]}
            attn["proj"] = {"kernel": _dense(sd[f"{t}.attn.proj.weight"]),
                            "bias": sd[f"{t}.attn.proj.bias"]}
            params[f"stage{si}_block{bi}"] = {
                "norm1": {"scale": sd[f"{t}.norm1.weight"],
                          "bias": sd[f"{t}.norm1.bias"]},
                "norm2": {"scale": sd[f"{t}.norm2.weight"],
                          "bias": sd[f"{t}.norm2.bias"]},
                "attn": attn,
                "mlp": {
                    "Dense_0": {"kernel": _dense(sd[f"{t}.mlp.fc1.weight"]),
                                "bias": sd[f"{t}.mlp.fc1.bias"]},
                    "Dense_1": {"kernel": _dense(sd[f"{t}.mlp.fc2.weight"]),
                                "bias": sd[f"{t}.mlp.fc2.bias"]},
                },
            }
            stats[f"stage{si}_block{bi}"] = {"attn": attn_stats}
    if "norm.weight" in sd:
        params["norm"] = {"scale": sd["norm.weight"],
                          "bias": sd["norm.bias"]}
    else:
        # HF CvtModel carries no final LayerNorm (it lives in the
        # classification head); identity matches a fresh init.
        dim = params[f"embed{len(depths) - 1}"]["bias"].shape[0]
        params["norm"] = {"scale": np.ones(dim, np.float32),
                          "bias": np.zeros(dim, np.float32)}
    return {"params": params, "batch_stats": stats}


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
