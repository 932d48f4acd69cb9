"""Cross-implementation Swin parity: our Flax Swin vs transformers.SwinModel.

Random weights are exported from HuggingFace's Swin (an independent,
widely-validated implementation of the same architecture the reference
vendors) into our module; identical inputs must give near-identical
outputs. This validates window partition/shift masks/relative-position
bias/patch-merging/GELU conventions end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from computervision_codes_tpu.models.swin import SwinTransformer


def _hf_to_ours(sd, depths):
    def dense(w):
        return np.transpose(w, (1, 0))

    p = {
        "patch_embed": {
            "kernel": np.transpose(
                sd["embeddings.patch_embeddings.projection.weight"],
                (2, 3, 1, 0)),
            "bias": sd["embeddings.patch_embeddings.projection.bias"],
        },
        "patch_norm": {"scale": sd["embeddings.norm.weight"],
                       "bias": sd["embeddings.norm.bias"]},
        "norm": {"scale": sd["layernorm.weight"],
                 "bias": sd["layernorm.bias"]},
    }
    for si, depth in enumerate(depths):
        for bi in range(depth):
            t = f"encoder.layers.{si}.blocks.{bi}"
            qkv_w = np.concatenate(
                [sd[f"{t}.attention.self.{n}.weight"] for n in
                 ("query", "key", "value")], axis=0)
            qkv_b = np.concatenate(
                [sd[f"{t}.attention.self.{n}.bias"] for n in
                 ("query", "key", "value")], axis=0)
            p[f"stage{si}_block{bi}"] = {
                "norm1": {"scale": sd[f"{t}.layernorm_before.weight"],
                          "bias": sd[f"{t}.layernorm_before.bias"]},
                "norm2": {"scale": sd[f"{t}.layernorm_after.weight"],
                          "bias": sd[f"{t}.layernorm_after.bias"]},
                "attn": {
                    "qkv": {"kernel": dense(qkv_w), "bias": qkv_b},
                    "proj": {"kernel": dense(
                        sd[f"{t}.attention.output.dense.weight"]),
                        "bias": sd[f"{t}.attention.output.dense.bias"]},
                    "relative_position_bias_table":
                        sd[f"{t}.attention.self.relative_position_bias_table"],
                },
                "mlp": {
                    "Dense_0": {"kernel": dense(
                        sd[f"{t}.intermediate.dense.weight"]),
                        "bias": sd[f"{t}.intermediate.dense.bias"]},
                    "Dense_1": {"kernel": dense(
                        sd[f"{t}.output.dense.weight"]),
                        "bias": sd[f"{t}.output.dense.bias"]},
                },
            }
        if si < len(depths) - 1:
            d = f"encoder.layers.{si}.downsample"
            p[f"merge{si}"] = {
                "norm": {"scale": sd[f"{d}.norm.weight"],
                         "bias": sd[f"{d}.norm.bias"]},
                "reduction": {"kernel": dense(sd[f"{d}.reduction.weight"])},
            }
    return {"params": jax.tree.map(jnp.asarray, p)}


@pytest.mark.parametrize("depths,heads", [((1, 1), (2, 4)),
                                          ((2, 2), (2, 4))])
def test_swin_matches_huggingface(rng, depths, heads):
    from transformers import SwinConfig, SwinModel

    embed, window, img = 16, 4, 32
    cfg = SwinConfig(image_size=img, patch_size=4, embed_dim=embed,
                     depths=list(depths), num_heads=list(heads),
                     window_size=window, use_absolute_embeddings=False,
                     drop_path_rate=0.0, hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    hf = SwinModel(cfg, add_pooling_layer=False).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}

    variables = _hf_to_ours(sd, depths)
    ours = SwinTransformer(embed_dim=embed, depths=depths, num_heads=heads,
                           window_size=window, drop_path_rate=0.0)

    x = rng.standard_normal((2, img, img, 3)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.tensor(x.transpose(0, 3, 1, 2))
                  ).last_hidden_state.numpy()  # (B, L, C) after final LN
    out = ours.apply(variables, jnp.asarray(x))
    got = np.asarray(out["feature_map"]).reshape(want.shape)
    np.testing.assert_allclose(got, want, atol=2e-4)
