"""Weight-converter tests: numerical parity with a torch reference model.

torchvision isn't installed, so the test builds a torch resnet18 with
torchvision-identical module names/state_dict keys, converts its weights, and
checks the flax backbone reproduces the torch features.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

import flax

from vision_collision_detection_tpu.models.backbones import build_backbone
from vision_collision_detection_tpu.models.convert import (
    convert_torch_state_dict,
    load_npz,
    save_npz,
)


class TorchBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.relu = tnn.ReLU(inplace=True)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout),
            )

    def forward(self, x):
        idt = x
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if self.downsample is not None:
            idt = self.downsample(x)
        return self.relu(y + idt)


class TorchResNet18(tnn.Module):
    """torchvision-identical structure and state_dict names (fc omitted)."""

    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.relu = tnn.ReLU(inplace=True)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = tnn.Sequential(TorchBasicBlock(64, 64),
                                     TorchBasicBlock(64, 64))
        self.layer2 = tnn.Sequential(TorchBasicBlock(64, 128, 2),
                                     TorchBasicBlock(128, 128))
        self.layer3 = tnn.Sequential(TorchBasicBlock(128, 256, 2),
                                     TorchBasicBlock(256, 256))
        self.layer4 = tnn.Sequential(TorchBasicBlock(256, 512, 2),
                                     TorchBasicBlock(512, 512))

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        return x.mean(dim=(2, 3))  # global average pool → [N, 512]


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    m = TorchResNet18()
    # randomize BN running stats so eval-mode parity is a real test
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, tnn.BatchNorm2d):
                mod.running_mean.uniform_(-0.5, 0.5)
                mod.running_var.uniform_(0.5, 1.5)
    m.eval()
    return m


def _rename_downsample(sd):
    """torchvision uses layerX.Y.downsample.{0,1}; our torch mirror too."""
    return sd


def test_resnet18_numerical_parity(torch_model):
    sd = torch_model.state_dict()
    tree = convert_torch_state_dict(sd, "resnet18")

    net = build_backbone("resnet18", dtype=jnp.float32)
    variables = net.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3)),
        train=False,
    )
    params = flax.serialization.from_state_dict(
        flax.core.unfreeze(variables["params"]), tree["params"]
    )
    batch_stats = flax.serialization.from_state_dict(
        flax.core.unfreeze(variables["batch_stats"]), tree["batch_stats"]
    )

    x = np.random.default_rng(0).random((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    out = np.asarray(net.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(x), train=False,
    ))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_converted_tree_matches_init_structure(torch_model):
    """Every converted leaf must land on an existing flax param of the same
    shape (catches naming drift)."""
    tree = convert_torch_state_dict(torch_model.state_dict(), "resnet18")
    net = build_backbone("resnet18", dtype=jnp.float32)
    variables = net.init(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3)),
        train=False,
    )

    def flat(d, prefix=""):
        out = {}
        for k, v in d.items():
            key = f"{prefix}/{k}"
            if isinstance(v, dict):
                out.update(flat(v, key))
            else:
                out[key] = np.asarray(v).shape
        return out

    init_p = flat(flax.serialization.to_state_dict(variables["params"]))
    conv_p = flat(tree["params"])
    assert set(conv_p) == set(init_p)
    for k in init_p:
        assert conv_p[k] == init_p[k], k
    init_s = flat(flax.serialization.to_state_dict(variables["batch_stats"]))
    conv_s = flat(tree["batch_stats"])
    assert set(conv_s) == set(init_s)


def test_npz_roundtrip(tmp_path, torch_model):
    tree = convert_torch_state_dict(torch_model.state_dict(), "resnet18")
    p = str(tmp_path / "w.npz")
    save_npz(tree, p)
    loaded = load_npz(p)
    assert "params" in loaded and "batch_stats" in loaded
    np.testing.assert_array_equal(
        loaded["params"]["stem_conv"]["kernel"],
        np.asarray(tree["params"]["stem_conv"]["kernel"]),
    )


def test_pretrained_path_into_train_state(tmp_path, torch_model):
    from vision_collision_detection_tpu.config import ExperimentConfig
    from vision_collision_detection_tpu.train.steps import create_train_state

    tree = convert_torch_state_dict(torch_model.state_dict(), "resnet18")
    p = str(tmp_path / "w.npz")
    save_npz(tree, p)
    cfg = ExperimentConfig().override({
        "model.backbone": "resnet18",
        "model.temporal_mode": "pooling",
        "model.dtype": "float32",
        "model.pretrained_path": p,
        "data.fps": 4, "data.duration": 1, "data.frame_size": 32,
    })
    _, state = create_train_state(cfg, jax.random.PRNGKey(0), 10)
    np.testing.assert_allclose(
        np.asarray(state.params["backbone"]["stem_conv"]["kernel"]),
        tree["params"]["stem_conv"]["kernel"], rtol=1e-6,
    )
