"""Weight-converter parity: torch ResNet18 (torchvision layout) vs our Flax ResNet."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn

from computervision_codes_tpu.models.convert import (
    convert_swin,
    convert_torchvision_resnet,
)
from computervision_codes_tpu.models.resnet import build_resnet
from computervision_codes_tpu.models.swin import SwinTransformer


class TorchBasicBlock(nn.Module):
    """torchvision.resnet.BasicBlock with identical state_dict keys."""

    def __init__(self, inp, out, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inp, out, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(out)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(out, out, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out)
        self.downsample = None
        if stride != 1 or inp != out:
            self.downsample = nn.Sequential(
                nn.Conv2d(inp, out, 1, stride, bias=False),
                nn.BatchNorm2d(out))

    def forward(self, x):
        idt = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(out + idt)


class TorchResNet18(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        for li, (inp, out, stride) in enumerate(
                [(64, 64, 1), (64, 128, 2), (128, 256, 2), (256, 512, 2)]):
            setattr(self, f"layer{li + 1}", nn.Sequential(
                TorchBasicBlock(inp, out, stride),
                TorchBasicBlock(out, out, 1)))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for li in range(4):
            x = getattr(self, f"layer{li + 1}")(x)
        return x.mean(dim=(2, 3))


def test_resnet18_forward_parity_with_torch(rng):
    tm = TorchResNet18().eval()
    # randomize BN stats so the test isn't trivially mean0/var1
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()
          if "num_batches" not in k}
    variables = convert_torchvision_resnet(sd, (2, 2, 2, 2))

    x = rng.standard_normal((2, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()

    model = build_resnet("resnet18")
    got = model.apply(variables, jnp.asarray(x))["pooled"]
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_resnet18_frozen_bn_parity(rng):
    tm = TorchResNet18().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()
          if "num_batches" not in k}
    variables = convert_torchvision_resnet(sd, (2, 2, 2, 2), frozen_bn=True)
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    model = build_resnet("resnet18", frozen_bn=True)
    got = model.apply(variables, jnp.asarray(x))["pooled"]
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)


def test_swin_converter_shapes(rng):
    """Structural check: a synthetic microsoft-layout state_dict converts into
    params our SwinTransformer accepts and runs with."""
    embed, depths, heads, window = 32, (1, 1), (2, 4), 4
    sd = {}
    sd["patch_embed.proj.weight"] = rng.standard_normal((embed, 3, 4, 4)).astype(np.float32)
    sd["patch_embed.proj.bias"] = np.zeros(embed, np.float32)
    sd["patch_embed.norm.weight"] = np.ones(embed, np.float32)
    sd["patch_embed.norm.bias"] = np.zeros(embed, np.float32)
    for si, d in enumerate(depths):
        dim = embed * (2 ** si)
        for bi in range(d):
            t = f"layers.{si}.blocks.{bi}"
            sd[f"{t}.norm1.weight"] = np.ones(dim, np.float32)
            sd[f"{t}.norm1.bias"] = np.zeros(dim, np.float32)
            sd[f"{t}.norm2.weight"] = np.ones(dim, np.float32)
            sd[f"{t}.norm2.bias"] = np.zeros(dim, np.float32)
            sd[f"{t}.attn.qkv.weight"] = rng.standard_normal((3 * dim, dim)).astype(np.float32) * 0.02
            sd[f"{t}.attn.qkv.bias"] = np.zeros(3 * dim, np.float32)
            sd[f"{t}.attn.proj.weight"] = rng.standard_normal((dim, dim)).astype(np.float32) * 0.02
            sd[f"{t}.attn.proj.bias"] = np.zeros(dim, np.float32)
            sd[f"{t}.attn.relative_position_bias_table"] = \
                rng.standard_normal(((2 * window - 1) ** 2, heads[si])).astype(np.float32) * 0.02
            sd[f"{t}.mlp.fc1.weight"] = rng.standard_normal((4 * dim, dim)).astype(np.float32) * 0.02
            sd[f"{t}.mlp.fc1.bias"] = np.zeros(4 * dim, np.float32)
            sd[f"{t}.mlp.fc2.weight"] = rng.standard_normal((dim, 4 * dim)).astype(np.float32) * 0.02
            sd[f"{t}.mlp.fc2.bias"] = np.zeros(dim, np.float32)
        if si < len(depths) - 1:
            sd[f"layers.{si}.downsample.norm.weight"] = np.ones(4 * dim, np.float32)
            sd[f"layers.{si}.downsample.norm.bias"] = np.zeros(4 * dim, np.float32)
            sd[f"layers.{si}.downsample.reduction.weight"] = \
                rng.standard_normal((2 * dim, 4 * dim)).astype(np.float32) * 0.02
    final = embed * (2 ** (len(depths) - 1))
    sd["norm.weight"] = np.ones(final, np.float32)
    sd["norm.bias"] = np.zeros(final, np.float32)

    variables = convert_swin(sd, depths)
    model = SwinTransformer(embed_dim=embed, depths=depths, num_heads=heads,
                            window_size=window, drop_path_rate=0.0)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    # verify the converted tree matches the module's expected structure
    ref = model.init(jax.random.PRNGKey(0), x)
    ref_shapes = jax.tree.map(lambda a: a.shape, ref["params"])
    got_shapes = jax.tree.map(lambda a: a.shape, variables["params"])
    assert ref_shapes == got_shapes
    out = model.apply(variables, x)
    assert bool(jnp.isfinite(out["feature_map"]).all())
