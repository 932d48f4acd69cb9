"""CvT numerical parity vs HF transformers CvtModel.

The HF implementation shares the reference's vendored cls_cvt math
(BatchNorm'd depthwise qkv projections, full-dim**-0.5 attention scale,
conv embeddings with LayerNorm, cls token in the last stage) except for
the MLP activation (HF: exact GELU; reference: QuickGELU). The parity test
therefore runs our CvT with act=gelu_exact; a separate test pins the
QuickGELU formula against torch.
"""

import numpy as np
import torch

import jax.numpy as jnp

from computervision_codes_tpu.models.common import gelu_exact, quick_gelu
from computervision_codes_tpu.models.convert import convert_cvt
from computervision_codes_tpu.models.cvt import CvT

DIMS, DEPTHS, HEADS = (16, 32, 64), (1, 2, 3), (1, 2, 4)


def _hf_model():
    from transformers import CvtConfig, CvtModel

    torch.manual_seed(0)
    cfg = CvtConfig(embed_dim=list(DIMS), num_heads=list(HEADS),
                    depth=list(DEPTHS), patch_sizes=[7, 3, 3],
                    patch_stride=[4, 2, 2], patch_padding=[2, 1, 1],
                    drop_path_rate=[0.0, 0.0, 0.0])
    hf = CvtModel(cfg).eval()
    # randomize BN running stats so the mean/var mapping is exercised
    with torch.no_grad():
        for name, buf in hf.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.randn_like(buf) * 0.1)
            elif name.endswith("running_var"):
                buf.copy_(torch.rand_like(buf) * 0.5 + 0.75)
    return hf


def test_cvt_forward_matches_hf(rng):
    hf = _hf_model()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    variables = convert_cvt(sd, depths=DEPTHS)

    model = CvT(dims=DIMS, depths=DEPTHS, heads=HEADS,
                drop_path=(0.0, 0.0, 0.0), act=gelu_exact)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(x))
    got = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))

    np.testing.assert_allclose(
        np.asarray(got["pre_norm_map"]),
        want.last_hidden_state.numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got["pre_norm_cls"]), want.cls_token_value.numpy(),
        rtol=1e-4, atol=1e-4)
    # pooled = final-norm'd cls (reference forward: self.norm(cls).squeeze)
    assert got["pooled"].shape == (2, DIMS[-1])


def test_cvt_train_updates_projection_bn(rng):
    import jax

    model = CvT(dims=(8, 16), depths=(1, 1), heads=(1, 2),
                drop_path=(0.0, 0.0))
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    bn = variables["batch_stats"]["stage0_block0"]["attn"]["proj_q"]["bn"]
    assert np.allclose(np.asarray(bn["mean"]), 0.0)
    _, mutated = model.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    after = mutated["batch_stats"]["stage0_block0"]["attn"]["proj_q"]["bn"]
    assert not np.allclose(np.asarray(after["mean"]), np.asarray(bn["mean"]))


def test_quick_gelu_matches_torch_formula(rng):
    x = rng.standard_normal((64,)).astype(np.float32)
    want = torch.from_numpy(x) * torch.sigmoid(1.702 * torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(quick_gelu(jnp.asarray(x))),
                               want.numpy(), rtol=1e-6, atol=1e-6)
    # and it differs from exact GELU (guards against silently swapping acts)
    assert not np.allclose(np.asarray(quick_gelu(jnp.asarray(x))),
                           np.asarray(gelu_exact(jnp.asarray(x))), atol=1e-3)
