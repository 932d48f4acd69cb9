"""TResNet numerical parity vs a torch re-statement of the reference.

The reference TResNet (MT4MTLKD/Spatial_transformer/models/tresnet/
tresnet_sync.py) requires the CUDA-only inplace_abn package; here InPlaceABN
is mocked as BatchNorm2d + LeakyReLU (mathematically what it computes in
eval) and the module tree is named EXACTLY like the official checkpoints
(body.conv1.0, body.layer{L}.{b}.conv1.0/.1, se.fc1, downsample.1.0, ...)
so the same test also proves convert_tresnet's key mapping on real .pth
layouts. Structure being pinned: blur-pool AFTER the stride-1 conv+ABN,
AvgPool+1x1 shortcut, plain-ReLU residual, stem slope 1e-2, bottleneck SE
reduce max(planes*4//8, 64) applied before conv3.
"""

from collections import OrderedDict

import numpy as np
import torch
import torch.nn.functional as F
from torch import nn

import jax.numpy as jnp

from computervision_codes_tpu.models.convert import convert_tresnet
from computervision_codes_tpu.models.tresnet import TResNet

WIDTH, LAYERS = 16, (1, 2, 2, 1)


class MockABN(nn.BatchNorm2d):
    def __init__(self, nf, activation="leaky_relu", slope=1e-2):
        super().__init__(nf, eps=1e-5)
        self.activation, self.slope = activation, slope

    def forward(self, x):
        y = super().forward(x)
        if self.activation == "leaky_relu":
            return F.leaky_relu(y, self.slope)
        return y


def conv_abn(ni, nf, stride=1, k=3, act="leaky_relu", slope=1e-2):
    return nn.Sequential(
        nn.Conv2d(ni, nf, k, stride, k // 2, bias=False),
        MockABN(nf, act, slope))


class Blur(nn.Module):
    def forward(self, x):
        c = x.shape[1]
        a = torch.tensor([1.0, 2.0, 1.0])
        f = (a[:, None] * a[None, :] / 16.0).repeat(c, 1, 1, 1)
        return F.conv2d(F.pad(x, (1, 1, 1, 1), "reflect"), f,
                        stride=2, groups=c)


class SE(nn.Module):
    def __init__(self, ch, red):
        super().__init__()
        self.fc1 = nn.Conv2d(ch, red, 1)
        self.fc2 = nn.Conv2d(red, ch, 1)

    def forward(self, x):
        s = torch.sigmoid(self.fc2(F.relu(self.fc1(x.mean((2, 3), True)))))
        return x * s


class Basic(nn.Module):
    expansion = 1

    def __init__(self, ni, nf, stride=1, use_se=True):
        super().__init__()
        c1 = conv_abn(ni, nf, 1, 3, slope=1e-3)
        self.conv1 = (nn.Sequential(c1, Blur()) if stride == 2 else c1)
        self.conv2 = conv_abn(nf, nf, 1, 3, act="identity")
        self.se = SE(nf, max(nf // 4, 64)) if use_se else None
        self.downsample = None
        if stride == 2 or ni != nf:
            steps = ([nn.AvgPool2d(2, 2, ceil_mode=True,
                                   count_include_pad=False)]
                     if stride == 2 else [])
            steps.append(conv_abn(ni, nf, 1, 1, act="identity"))
            self.downsample = nn.Sequential(*steps)

    def forward(self, x):
        res = self.downsample(x) if self.downsample is not None else x
        out = self.conv2(self.conv1(x))
        if self.se is not None:
            out = self.se(out)
        return F.relu(out + res)


class Bottle(nn.Module):
    expansion = 4

    def __init__(self, ni, nf, stride=1, use_se=True):
        super().__init__()
        self.conv1 = conv_abn(ni, nf, 1, 1, slope=1e-3)
        c2 = conv_abn(nf, nf, 1, 3, slope=1e-3)
        self.conv2 = (nn.Sequential(c2, Blur()) if stride == 2 else c2)
        self.conv3 = conv_abn(nf, nf * 4, 1, 1, act="identity")
        self.se = SE(nf, max(nf * 4 // 8, 64)) if use_se else None
        self.downsample = None
        if stride == 2 or ni != nf * 4:
            steps = ([nn.AvgPool2d(2, 2, ceil_mode=True,
                                   count_include_pad=False)]
                     if stride == 2 else [])
            steps.append(conv_abn(ni, nf * 4, 1, 1, act="identity"))
            self.downsample = nn.Sequential(*steps)

    def forward(self, x):
        res = self.downsample(x) if self.downsample is not None else x
        out = self.conv2(self.conv1(x))
        if self.se is not None:
            out = self.se(out)
        out = self.conv3(out)
        return F.relu(out + res)


class S2D(nn.Module):
    def forward(self, x):
        n, c, h, w = x.shape
        x = x.view(n, c, h // 4, 4, w // 4, 4)
        x = x.permute(0, 3, 5, 1, 2, 4).contiguous()
        return x.view(n, c * 16, h // 4, w // 4)


def _torch_tresnet(width, layers):
    torch.manual_seed(0)
    planes = width
    body = OrderedDict()
    body["SpaceToDepth"] = S2D()
    body["conv1"] = conv_abn(3 * 16, planes, 1, 3)  # default slope 1e-2
    ni = planes
    for si, depth in enumerate(layers):
        nf = planes * (2 ** si)
        cls = Basic if si < 2 else Bottle
        use_se = si < 3
        blocks = []
        for bi in range(depth):
            stride = 2 if si > 0 and bi == 0 else 1
            blocks.append(cls(ni, nf, stride, use_se))
            ni = nf * cls.expansion
        body[f"layer{si + 1}"] = nn.Sequential(*blocks)
    model = nn.Module()
    model.body = nn.Sequential(body)
    # randomize BN affine + running stats so the mapping is fully exercised
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, MockABN):
                m.weight.copy_(torch.rand(m.weight.shape, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.75)
    return model.eval()


def test_tresnet_forward_matches_torch_reference(rng):
    tm = _torch_tresnet(WIDTH, LAYERS)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables = convert_tresnet(sd, LAYERS)

    model = TResNet(width=WIDTH, layers=LAYERS)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = tm.body(torch.from_numpy(x))
    got = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))

    np.testing.assert_allclose(
        np.asarray(got["stages"][-1]),
        want.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(got["pooled"]), want.mean((2, 3)).numpy(),
        rtol=1e-4, atol=1e-4)


def test_tresnet_zero_gamma_init(rng):
    import jax

    model = TResNet(width=16, layers=(1, 1, 1, 1))
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    p = variables["params"]
    # last ABN of each block zero-gamma (tresnet_sync.py:196-199)...
    assert np.allclose(np.asarray(p["layer1_0"]["abn2"]["bn"]["scale"]), 0.0)
    assert np.allclose(np.asarray(p["layer3_0"]["abn3"]["bn"]["scale"]), 0.0)
    # ...but ordinary ABNs keep gamma=1
    assert np.allclose(np.asarray(p["layer1_0"]["abn1"]["bn"]["scale"]), 1.0)
