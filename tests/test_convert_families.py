"""Converter parity for mobilenet_v2 / efficientnet_v2_s.

torchvision isn't installed; these tests rebuild the torchvision module
NESTING (Sequential indices produce identical state_dict keys) in plain
torch, then verify the flax backbone reproduces the torch features with
converted weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

import flax

from vision_collision_detection_tpu.models.backbones import build_backbone
from vision_collision_detection_tpu.models.backbones.efficientnet import _V2_S
from vision_collision_detection_tpu.models.backbones.mobilenet import _V2_TABLE
from vision_collision_detection_tpu.models.convert import (
    convert_torch_state_dict,
)


def cna(cin, cout, k=3, stride=1, groups=1, act=True, act_layer=tnn.ReLU6):
    """torchvision Conv2dNormActivation: Sequential(conv, bn[, act])."""
    layers = [
        tnn.Conv2d(cin, cout, k, stride, k // 2, groups=groups, bias=False),
        tnn.BatchNorm2d(cout),
    ]
    if act:
        layers.append(act_layer(inplace=True))
    return tnn.Sequential(*layers)


# ---------------------------------------------------------------------------
class TorchInvertedResidualV2(tnn.Module):
    def __init__(self, cin, cout, stride, expand):
        super().__init__()
        self.use_res = stride == 1 and cin == cout
        hidden = cin * expand
        layers = []
        if expand != 1:
            layers.append(cna(cin, hidden, k=1))
        layers.append(cna(hidden, hidden, k=3, stride=stride, groups=hidden))
        layers.extend([
            tnn.Conv2d(hidden, cout, 1, bias=False),
            tnn.BatchNorm2d(cout),
        ])
        self.conv = tnn.Sequential(*layers)

    def forward(self, x):
        y = self.conv(x)
        return x + y if self.use_res else y


class TorchMobileNetV2(tnn.Module):
    def __init__(self):
        super().__init__()
        feats = [cna(3, 32, k=3, stride=2)]
        cin = 32
        for t, c, n, s in _V2_TABLE:
            for i in range(n):
                feats.append(TorchInvertedResidualV2(
                    cin, c, s if i == 0 else 1, t))
                cin = c
        feats.append(cna(cin, 1280, k=1))
        self.features = tnn.Sequential(*feats)

    def forward(self, x):
        return self.features(x).mean(dim=(2, 3))


# ---------------------------------------------------------------------------
class TorchSE(tnn.Module):
    """torchvision SqueezeExcitation (fc1/fc2 convs)."""

    def __init__(self, ch, squeeze):
        super().__init__()
        self.fc1 = tnn.Conv2d(ch, squeeze, 1)
        self.fc2 = tnn.Conv2d(squeeze, ch, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = torch.sigmoid(self.fc2(torch.relu(self.fc1(s))))
        return x * s


class TorchFusedMBConv(tnn.Module):
    def __init__(self, cin, cout, expand, k, stride):
        super().__init__()
        self.use_res = stride == 1 and cin == cout
        hidden = cin * expand
        if expand != 1:
            self.block = tnn.Sequential(
                cna(cin, hidden, k=k, stride=stride, act_layer=tnn.SiLU),
                cna(hidden, cout, k=1, act=False),
            )
        else:
            self.block = tnn.Sequential(
                cna(cin, cout, k=k, stride=stride, act_layer=tnn.SiLU),
            )
        self.expand = expand

    def forward(self, x):
        y = self.block(x)
        if self.expand == 1:
            pass  # act applied inside (torchvision fuses act into the CNA)
        return x + y if self.use_res else y


class TorchMBConv(tnn.Module):
    def __init__(self, cin, cout, expand, k, stride):
        super().__init__()
        self.use_res = stride == 1 and cin == cout
        hidden = cin * expand
        self.block = tnn.Sequential(
            cna(cin, hidden, k=1, act_layer=tnn.SiLU),
            cna(hidden, hidden, k=k, stride=stride, groups=hidden,
                act_layer=tnn.SiLU),
            TorchSE(hidden, max(1, cin // 4)),
            cna(hidden, cout, k=1, act=False),
        )

    def forward(self, x):
        y = self.block(x)
        return x + y if self.use_res else y


class TorchEffNetV2S(tnn.Module):
    def __init__(self):
        super().__init__()
        stem_ch, table = _V2_S
        feats = [cna(3, stem_ch, k=3, stride=2, act_layer=tnn.SiLU)]
        cin = stem_ch
        for kind, expand, k, stride, cout, repeats in table:
            stage = []
            for i in range(repeats):
                cls = TorchFusedMBConv if kind == "fused" else TorchMBConv
                stage.append(cls(cin, cout, expand, k,
                                 stride if i == 0 else 1))
                cin = cout
            feats.append(tnn.Sequential(*stage))
        feats.append(cna(cin, 1280, k=1, act_layer=tnn.SiLU))
        self.features = tnn.Sequential(*feats)

    def forward(self, x):
        return self.features(x).mean(dim=(2, 3))


# ---------------------------------------------------------------------------
def _randomize_bn(m):
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.8, 1.2)


def _parity(torch_model, backbone_name, size=64, rtol=2e-3, atol=2e-3):
    torch_model.eval()
    sd = torch_model.state_dict()
    tree = convert_torch_state_dict(sd, backbone_name)
    net = build_backbone(backbone_name, dtype=jnp.float32)
    variables = net.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, size, size, 3)),
        train=False,
    )
    params = flax.serialization.from_state_dict(
        flax.core.unfreeze(variables["params"]), tree["params"]
    )
    batch_stats = flax.serialization.from_state_dict(
        flax.core.unfreeze(variables["batch_stats"]), tree["batch_stats"]
    )
    x = np.random.default_rng(0).random((2, size, size, 3)).astype(np.float32)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    out = np.asarray(net.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(x), train=False,
    ))
    np.testing.assert_allclose(out, ref, rtol=rtol, atol=atol)


def test_mobilenet_v2_parity():
    torch.manual_seed(0)
    m = TorchMobileNetV2()
    _randomize_bn(m)
    _parity(m, "mobilenet_v2")


def test_efficientnet_v2_s_parity():
    torch.manual_seed(1)
    m = TorchEffNetV2S()
    _randomize_bn(m)
    _parity(m, "efficientnet_v2_s")


class TorchInvertedResidualV3(tnn.Module):
    def __init__(self, cin, k, exp, cout, use_se, use_hs, stride):
        super().__init__()
        self.use_res = stride == 1 and cin == cout
        act = tnn.Hardswish if use_hs else tnn.ReLU
        layers = []
        if exp != cin:
            layers.append(cna(cin, exp, k=1, act_layer=act))
        layers.append(cna(exp, exp, k=k, stride=stride, groups=exp,
                          act_layer=act))
        if use_se:
            squeeze = _make_div(exp // 4)
            layers.append(TorchSEv3(exp, squeeze))
        layers.append(cna(exp, cout, k=1, act=False))
        self.block = tnn.Sequential(*layers)

    def forward(self, x):
        y = self.block(x)
        return x + y if self.use_res else y


def _make_div(v, d=8):
    out = max(d, int(v + d / 2) // d * d)
    return out + d if out < 0.9 * v else out


class TorchSEv3(tnn.Module):
    def __init__(self, ch, squeeze):
        super().__init__()
        self.fc1 = tnn.Conv2d(ch, squeeze, 1)
        self.fc2 = tnn.Conv2d(squeeze, ch, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = tnn.functional.hardsigmoid(self.fc2(torch.relu(self.fc1(s))))
        return x * s


class TorchMobileNetV3Small(tnn.Module):
    def __init__(self):
        super().__init__()
        from vision_collision_detection_tpu.models.backbones.mobilenet import (
            _V3_SMALL_TABLE,
        )

        feats = [cna(3, 16, k=3, stride=2, act_layer=tnn.Hardswish)]
        cin = 16
        for k, exp, out, se, hs, s in _V3_SMALL_TABLE:
            feats.append(TorchInvertedResidualV3(cin, k, exp, out, se, hs, s))
            cin = out
        feats.append(cna(cin, 576, k=1, act_layer=tnn.Hardswish))
        self.features = tnn.Sequential(*feats)

    def forward(self, x):
        return self.features(x).mean(dim=(2, 3))


def test_mobilenet_v3_small_parity():
    torch.manual_seed(2)
    m = TorchMobileNetV3Small()
    _randomize_bn(m)
    _parity(m, "mobilenet_v3_small")


def test_unsupported_backbone_raises():
    with pytest.raises(NotImplementedError):
        convert_torch_state_dict({}, "vivit_small")
