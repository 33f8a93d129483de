"""Generate torchvision state_dict key+shape manifests for the 10 backbones.

The reference loads these exact pretrained torchvision models
(/root/reference/nexar_arch.py:289-341). torchvision is not installed here,
but its state_dict layout is a deterministic public fact of the architecture
code (Sequential nesting + Conv2dNormActivation/CNBlock/MBConv structure).
This script derives each manifest from those construction rules and writes
them to vision_collision_detection_tpu/models/manifests/<name>.json so that
tests/test_manifests.py can assert models/convert.py consumes exactly the
real key set — no missing keys, no unexpected keys — and that the converted
shapes match our flax backbones' init structure.

Shapes follow torch conventions: Conv2d [out, in/groups, kh, kw],
Linear [out, in], BatchNorm 1-D vectors plus a scalar num_batches_tracked.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from vision_collision_detection_tpu.models.backbones.efficientnet import (  # noqa: E402
    _V2_L,
    _V2_M,
    _V2_S,
)
from vision_collision_detection_tpu.models.backbones.mobilenet import (  # noqa: E402
    _V2_TABLE,
    _V3_SMALL_TABLE,
)

OUT_DIR = os.path.join(REPO, "vision_collision_detection_tpu", "models", "manifests")


def bn(m, name, ch):
    m[f"{name}.weight"] = [ch]
    m[f"{name}.bias"] = [ch]
    m[f"{name}.running_mean"] = [ch]
    m[f"{name}.running_var"] = [ch]
    m[f"{name}.num_batches_tracked"] = []


def conv(m, name, cout, cin, k, bias=False):
    m[f"{name}.weight"] = [cout, cin, k, k]
    if bias:
        m[f"{name}.bias"] = [cout]


def linear(m, name, cout, cin):
    m[f"{name}.weight"] = [cout, cin]
    m[f"{name}.bias"] = [cout]


def ln(m, name, ch):
    m[f"{name}.weight"] = [ch]
    m[f"{name}.bias"] = [ch]


# ---------------------------------------------------------------------------
def resnet(stage_sizes, bottleneck):
    m = {}
    conv(m, "conv1", 64, 3, 7)
    bn(m, "bn1", 64)
    cin = 64
    for stage, blocks in enumerate(stage_sizes):
        planes = 64 * (2 ** stage)
        cout = planes * (4 if bottleneck else 1)
        for b in range(blocks):
            src = f"layer{stage + 1}.{b}"
            if bottleneck:
                conv(m, f"{src}.conv1", planes, cin, 1)
                bn(m, f"{src}.bn1", planes)
                conv(m, f"{src}.conv2", planes, planes, 3)
                bn(m, f"{src}.bn2", planes)
                conv(m, f"{src}.conv3", cout, planes, 1)
                bn(m, f"{src}.bn3", cout)
            else:
                conv(m, f"{src}.conv1", cout, cin, 3)
                bn(m, f"{src}.bn1", cout)
                conv(m, f"{src}.conv2", cout, cout, 3)
                bn(m, f"{src}.bn2", cout)
            if b == 0 and cin != cout:
                conv(m, f"{src}.downsample.0", cout, cin, 1)
                bn(m, f"{src}.downsample.1", cout)
            cin = cout
    linear(m, "fc", 1000, cin)
    return m


def convnext(depths, dims):
    m = {}
    conv(m, "features.0.0", dims[0], 3, 4, bias=True)
    ln(m, "features.0.1", dims[0])
    for stage in range(4):
        f = 1 + 2 * stage
        d = dims[stage]
        if stage > 0:
            ln(m, f"features.{f - 1}.0", dims[stage - 1])
            conv(m, f"features.{f - 1}.1", d, dims[stage - 1], 2, bias=True)
        for b in range(depths[stage]):
            src = f"features.{f}.{b}"
            # CNBlock: 0 dwconv(7,groups=d), 2 LN, 3 Linear d→4d, 5 Linear 4d→d
            m[f"{src}.block.0.weight"] = [d, 1, 7, 7]
            m[f"{src}.block.0.bias"] = [d]
            ln(m, f"{src}.block.2", d)
            linear(m, f"{src}.block.3", 4 * d, d)
            linear(m, f"{src}.block.5", d, 4 * d)
            m[f"{src}.layer_scale"] = [d, 1, 1]
    ln(m, "classifier.0", dims[-1])
    linear(m, "classifier.2", 1000, dims[-1])
    return m


def mobilenet_v2():
    m = {}
    conv(m, "features.0.0", 32, 3, 3)
    bn(m, "features.0.1", 32)
    cin, fi = 32, 1
    for t, c, n, s in _V2_TABLE:
        for i in range(n):
            src = f"features.{fi}.conv"
            hidden = cin * t
            if t == 1:
                m[f"{src}.0.0.weight"] = [hidden, 1, 3, 3]
                bn(m, f"{src}.0.1", hidden)
                conv(m, f"{src}.1", c, hidden, 1)
                bn(m, f"{src}.2", c)
            else:
                conv(m, f"{src}.0.0", hidden, cin, 1)
                bn(m, f"{src}.0.1", hidden)
                m[f"{src}.1.0.weight"] = [hidden, 1, 3, 3]
                bn(m, f"{src}.1.1", hidden)
                conv(m, f"{src}.2", c, hidden, 1)
                bn(m, f"{src}.3", c)
            cin = c
            fi += 1
    conv(m, f"features.{fi}.0", 1280, cin, 1)
    bn(m, f"features.{fi}.1", 1280)
    linear(m, "classifier.1", 1000, 1280)
    return m


def _make_div(v, d=8):
    out = max(d, int(v + d / 2) // d * d)
    return out + d if out < 0.9 * v else out


def mobilenet_v3_small():
    m = {}
    conv(m, "features.0.0", 16, 3, 3)
    bn(m, "features.0.1", 16)
    cin = 16
    for blk, (k, exp, cout, use_se, _hs, _s) in enumerate(_V3_SMALL_TABLE):
        src = f"features.{blk + 1}.block"
        li = 0
        if exp != cin:
            conv(m, f"{src}.{li}.0", exp, cin, 1)
            bn(m, f"{src}.{li}.1", exp)
            li += 1
        m[f"{src}.{li}.0.weight"] = [exp, 1, k, k]
        bn(m, f"{src}.{li}.1", exp)
        li += 1
        if use_se:
            squeeze = _make_div(exp // 4)
            conv(m, f"{src}.{li}.fc1", squeeze, exp, 1, bias=True)
            conv(m, f"{src}.{li}.fc2", exp, squeeze, 1, bias=True)
            li += 1
        conv(m, f"{src}.{li}.0", cout, exp, 1)
        bn(m, f"{src}.{li}.1", cout)
        cin = cout
    head = len(_V3_SMALL_TABLE) + 1
    conv(m, f"features.{head}.0", 576, cin, 1)
    bn(m, f"features.{head}.1", 576)
    linear(m, "classifier.0", 1024, 576)
    linear(m, "classifier.3", 1000, 1024)
    return m


def efficientnet_v2(stem_ch, table):
    m = {}
    conv(m, "features.0.0", stem_ch, 3, 3)
    bn(m, "features.0.1", stem_ch)
    cin = stem_ch
    for stage, (kind, expand, k, _s, cout, repeats) in enumerate(table, 1):
        for i in range(repeats):
            src = f"features.{stage}.{i}.block"
            hidden = cin * expand
            if kind == "fused":
                if expand == 1:
                    conv(m, f"{src}.0.0", cout, cin, k)
                    bn(m, f"{src}.0.1", cout)
                else:
                    conv(m, f"{src}.0.0", hidden, cin, k)
                    bn(m, f"{src}.0.1", hidden)
                    conv(m, f"{src}.1.0", cout, hidden, 1)
                    bn(m, f"{src}.1.1", cout)
            else:  # MBConv with SE (squeeze = cin // 4)
                conv(m, f"{src}.0.0", hidden, cin, 1)
                bn(m, f"{src}.0.1", hidden)
                m[f"{src}.1.0.weight"] = [hidden, 1, k, k]
                bn(m, f"{src}.1.1", hidden)
                squeeze = max(1, cin // 4)
                conv(m, f"{src}.2.fc1", squeeze, hidden, 1, bias=True)
                conv(m, f"{src}.2.fc2", hidden, squeeze, 1, bias=True)
                conv(m, f"{src}.3.0", cout, hidden, 1)
                bn(m, f"{src}.3.1", cout)
            cin = cout
    head = len(table) + 1
    conv(m, f"features.{head}.0", 1280, cin, 1)
    bn(m, f"features.{head}.1", 1280)
    linear(m, "classifier.1", 1000, 1280)
    return m


# Published torchvision parameter counts (docs "num_params"); the generated
# manifests are asserted to match these exactly — an independent check that
# the derived layout is the real one.
PUBLISHED_NUM_PARAMS = {
    "resnet18": 11_689_512,
    "resnet50": 25_557_032,
    "convnext_tiny": 28_589_128,
    "convnext_base": 88_591_464,
    "convnext_large": 197_767_336,
    "mobilenet_v2": 3_504_872,
    "mobilenet_v3_small": 2_542_856,
    "efficientnet_v2_s": 21_458_488,
    "efficientnet_v2_m": 54_139_356,
    "efficientnet_v2_l": 118_515_272,
}


MANIFESTS = {
    "resnet18": lambda: resnet((2, 2, 2, 2), False),
    "resnet50": lambda: resnet((3, 4, 6, 3), True),
    "convnext_tiny": lambda: convnext((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnext_base": lambda: convnext((3, 3, 27, 3), (128, 256, 512, 1024)),
    "convnext_large": lambda: convnext((3, 3, 27, 3), (192, 384, 768, 1536)),
    "mobilenet_v2": mobilenet_v2,
    "mobilenet_v3_small": mobilenet_v3_small,
    "efficientnet_v2_s": lambda: efficientnet_v2(*_V2_S),
    "efficientnet_v2_m": lambda: efficientnet_v2(*_V2_M),
    "efficientnet_v2_l": lambda: efficientnet_v2(*_V2_L),
}


def _num_params(keys):
    import numpy as np

    return int(sum(int(np.prod(s)) for k, s in keys.items()
                   if "running_" not in k and "num_batches" not in k))


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    for name, builder in MANIFESTS.items():
        keys = builder()
        n_params = _num_params(keys)
        assert n_params == PUBLISHED_NUM_PARAMS[name], (
            name, n_params, PUBLISHED_NUM_PARAMS[name])
        doc = {
            "__meta__": {
                "model": name,
                "source": "torchvision public state_dict layout "
                          "(derived from the architecture construction "
                          "rules; reference loads this model at "
                          "/root/reference/nexar_arch.py:289-341)",
                "n_keys": len(keys),
                "num_params": n_params,
                "num_params_matches_published_torchvision": True,
            },
            "keys": keys,
        }
        path = os.path.join(OUT_DIR, f"{name}.json")
        with open(path, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"{name}: {len(keys)} keys, {n_params / 1e6:.2f}M params "
              f"(== published) → {path}")


if __name__ == "__main__":
    main()
