"""torchvision → flax weight conversion.

The reference gets its accuracy from ImageNet-pretrained torchvision
backbones (/root/reference/nexar_arch.py:289-341, ``pretrained=True``). This
environment has torch but not torchvision, so conversion is an offline tool:
feed it a torchvision ``state_dict`` (torch.load'd .pth) and it emits the
flax param/batch_stats trees for our NHWC backbones, saved as .npz for
``ModelConfig.pretrained_path``.

Layout rules:
- Conv2d weight [O, I, kh, kw] → flax kernel [kh, kw, I, O]
- depthwise Conv2d [C, 1, kh, kw] → flax [kh, kw, 1, C]
- Linear weight [O, I] → flax kernel [I, O]
- BatchNorm weight/bias → scale/bias; running_mean/var → batch_stats
- LayerNorm weight/bias → scale/bias
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np


def _t(x) -> np.ndarray:
    try:  # torch tensor → numpy
        return x.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(x)


def _conv(sd, name):
    return np.transpose(_t(sd[f"{name}.weight"]), (2, 3, 1, 0))


def _dwconv(sd, name):
    w = _t(sd[f"{name}.weight"])  # [C, 1, kh, kw]
    return np.transpose(w, (2, 3, 1, 0))  # [kh, kw, 1, C]


def _linear(sd, name):
    return {"kernel": _t(sd[f"{name}.weight"]).T,
            "bias": _t(sd[f"{name}.bias"])}


def _bn(sd, name) -> Tuple[dict, dict]:
    params = {"scale": _t(sd[f"{name}.weight"]),
              "bias": _t(sd[f"{name}.bias"])}
    stats = {"mean": _t(sd[f"{name}.running_mean"]),
             "var": _t(sd[f"{name}.running_var"])}
    return params, stats


def _ln(sd, name):
    return {"scale": _t(sd[f"{name}.weight"]), "bias": _t(sd[f"{name}.bias"])}


# ---------------------------------------------------------------------------
# ResNet (torchvision resnet18/resnet50 naming)
# ---------------------------------------------------------------------------
def convert_resnet(sd: Dict, stage_sizes, bottleneck: bool) -> Dict:
    params: Dict = {}
    stats: Dict = {}
    params["stem_conv"] = {"kernel": _conv(sd, "conv1")}
    params["stem_bn"], stats["stem_bn"] = _bn(sd, "bn1")
    n_convs = 3 if bottleneck else 2
    for stage, blocks in enumerate(stage_sizes):
        for b in range(blocks):
            src = f"layer{stage + 1}.{b}"
            dst = f"layer{stage + 1}_{b}"
            block_p: Dict = {}
            block_s: Dict = {}
            for c in range(1, n_convs + 1):
                block_p[f"conv{c}"] = {"kernel": _conv(sd, f"{src}.conv{c}")}
                block_p[f"bn{c}"], block_s[f"bn{c}"] = _bn(sd, f"{src}.bn{c}")
            if f"{src}.downsample.0.weight" in sd:
                block_p["downsample_conv"] = {
                    "kernel": _conv(sd, f"{src}.downsample.0")
                }
                block_p["downsample_bn"], block_s["downsample_bn"] = _bn(
                    sd, f"{src}.downsample.1"
                )
            params[dst] = block_p
            stats[dst] = block_s
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# ConvNeXt (torchvision convnext_{tiny,base,large} naming)
# ---------------------------------------------------------------------------
def convert_convnext(sd: Dict, depths) -> Dict:
    params: Dict = {}
    params["stem_conv"] = {"kernel": _conv(sd, "features.0.0"),
                           "bias": _t(sd["features.0.0.bias"])}
    params["stem_norm"] = _ln(sd, "features.0.1")
    for stage in range(len(depths)):
        feat_idx = 1 + 2 * stage  # stages at features.1,3,5,7
        if stage > 0:
            ds = f"features.{feat_idx - 1}"
            params[f"downsample{stage}_norm"] = _ln(sd, f"{ds}.0")
            params[f"downsample{stage}_conv"] = {
                "kernel": _conv(sd, f"{ds}.1"),
                "bias": _t(sd[f"{ds}.1.bias"]),
            }
        for b in range(depths[stage]):
            src = f"features.{feat_idx}.{b}.block"
            params[f"stage{stage}_block{b}"] = {
                "dwconv": {"kernel": _dwconv(sd, f"{src}.0"),
                           "bias": _t(sd[f"{src}.0.bias"])},
                "norm": _ln(sd, f"{src}.2"),
                "pwconv1": _linear(sd, f"{src}.3"),
                "pwconv2": _linear(sd, f"{src}.5"),
                "gamma": _t(sd[f"features.{feat_idx}.{b}.layer_scale"]).reshape(-1),
            }
    # torchvision classifier.0 is the final LayerNorm2d before the fc head
    if "classifier.0.weight" in sd:
        params["head_norm"] = _ln(sd, "classifier.0")
    return {"params": params, "batch_stats": {}}


# ---------------------------------------------------------------------------
# MobileNetV2 (torchvision naming: features.N.conv.{...}, torchvision>=0.9)
# ---------------------------------------------------------------------------
def convert_mobilenet_v2(sd: Dict) -> Dict:
    from vision_collision_detection_tpu.models.backbones.mobilenet import (
        _V2_TABLE,
    )

    params: Dict = {}
    stats: Dict = {}
    params["stem_conv"] = {"kernel": _conv(sd, "features.0.0")}
    params["stem_bn"], stats["stem_bn"] = _bn(sd, "features.0.1")

    feat_idx = 1
    blk = 0
    for t, c, n, s in _V2_TABLE:
        for i in range(n):
            src = f"features.{feat_idx}.conv"
            p: Dict = {}
            st: Dict = {}
            if t == 1:
                # no expand: conv.0 = dw ConvBNAct, conv.1/2 = project
                p["dw_conv"] = {"kernel": _dwconv(sd, f"{src}.0.0")}
                p["dw_bn"], st["dw_bn"] = _bn(sd, f"{src}.0.1")
                p["project_conv"] = {"kernel": _conv(sd, f"{src}.1")}
                p["project_bn"], st["project_bn"] = _bn(sd, f"{src}.2")
            else:
                p["expand_conv"] = {"kernel": _conv(sd, f"{src}.0.0")}
                p["expand_bn"], st["expand_bn"] = _bn(sd, f"{src}.0.1")
                p["dw_conv"] = {"kernel": _dwconv(sd, f"{src}.1.0")}
                p["dw_bn"], st["dw_bn"] = _bn(sd, f"{src}.1.1")
                p["project_conv"] = {"kernel": _conv(sd, f"{src}.2")}
                p["project_bn"], st["project_bn"] = _bn(sd, f"{src}.3")
            params[f"block{blk}"] = p
            stats[f"block{blk}"] = st
            feat_idx += 1
            blk += 1
    params["head_conv"] = {"kernel": _conv(sd, f"features.{feat_idx}.0")}
    params["head_bn"], stats["head_bn"] = _bn(sd, f"features.{feat_idx}.1")
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# EfficientNetV2 (torchvision naming: features.N.M.block.{...})
# ---------------------------------------------------------------------------
def convert_efficientnet_v2(sd: Dict, table, stem_name="features.0") -> Dict:
    params: Dict = {}
    stats: Dict = {}
    params["stem_conv"] = {"kernel": _conv(sd, f"{stem_name}.0")}
    params["stem_bn"], stats["stem_bn"] = _bn(sd, f"{stem_name}.1")

    blk = 0
    for stage_idx, (kind, expand, kernel, stride, out_ch, repeats) in enumerate(
        table, start=1
    ):
        for i in range(repeats):
            src = f"features.{stage_idx}.{i}.block"
            p: Dict = {}
            st: Dict = {}
            if kind == "fused":
                if expand != 1:
                    p["expand_conv"] = {"kernel": _conv(sd, f"{src}.0.0")}
                    p["expand_bn"], st["expand_bn"] = _bn(sd, f"{src}.0.1")
                    p["project_conv"] = {"kernel": _conv(sd, f"{src}.1.0")}
                    p["project_bn"], st["project_bn"] = _bn(sd, f"{src}.1.1")
                else:
                    p["project_conv"] = {"kernel": _conv(sd, f"{src}.0.0")}
                    p["project_bn"], st["project_bn"] = _bn(sd, f"{src}.0.1")
            else:  # MBConv with SE
                p["expand_conv"] = {"kernel": _conv(sd, f"{src}.0.0")}
                p["expand_bn"], st["expand_bn"] = _bn(sd, f"{src}.0.1")
                p["dw_conv"] = {"kernel": _dwconv(sd, f"{src}.1.0")}
                p["dw_bn"], st["dw_bn"] = _bn(sd, f"{src}.1.1")
                p["se"] = {
                    "fc1": {"kernel": _conv(sd, f"{src}.2.fc1"),
                            "bias": _t(sd[f"{src}.2.fc1.bias"])},
                    "fc2": {"kernel": _conv(sd, f"{src}.2.fc2"),
                            "bias": _t(sd[f"{src}.2.fc2.bias"])},
                }
                p["project_conv"] = {"kernel": _conv(sd, f"{src}.3.0")}
                p["project_bn"], st["project_bn"] = _bn(sd, f"{src}.3.1")
            params[f"block{blk}"] = p
            stats[f"block{blk}"] = st
            blk += 1
    head = f"features.{len(table) + 1}"
    params["head_conv"] = {"kernel": _conv(sd, f"{head}.0")}
    params["head_bn"], stats["head_bn"] = _bn(sd, f"{head}.1")
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# MobileNetV3-Small (torchvision naming: features.N.block.{...})
# ---------------------------------------------------------------------------
def convert_mobilenet_v3_small(sd: Dict) -> Dict:
    from vision_collision_detection_tpu.models.backbones.mobilenet import (
        _V3_SMALL_TABLE,
    )

    params: Dict = {}
    stats: Dict = {}
    params["stem_conv"] = {"kernel": _conv(sd, "features.0.0")}
    params["stem_bn"], stats["stem_bn"] = _bn(sd, "features.0.1")

    cin = 16
    for blk, (k, exp, out, use_se, hs, stride) in enumerate(_V3_SMALL_TABLE):
        src = f"features.{blk + 1}.block"
        p: Dict = {}
        st: Dict = {}
        li = 0
        if exp != cin:
            p["expand_conv"] = {"kernel": _conv(sd, f"{src}.{li}.0")}
            p["expand_bn"], st["expand_bn"] = _bn(sd, f"{src}.{li}.1")
            li += 1
        p["dw_conv"] = {"kernel": _dwconv(sd, f"{src}.{li}.0")}
        p["dw_bn"], st["dw_bn"] = _bn(sd, f"{src}.{li}.1")
        li += 1
        if use_se:
            p["se"] = {
                "fc1": {"kernel": _conv(sd, f"{src}.{li}.fc1"),
                        "bias": _t(sd[f"{src}.{li}.fc1.bias"])},
                "fc2": {"kernel": _conv(sd, f"{src}.{li}.fc2"),
                        "bias": _t(sd[f"{src}.{li}.fc2.bias"])},
            }
            li += 1
        p["project_conv"] = {"kernel": _conv(sd, f"{src}.{li}.0")}
        p["project_bn"], st["project_bn"] = _bn(sd, f"{src}.{li}.1")
        params[f"block{blk}"] = p
        stats[f"block{blk}"] = st
        cin = out
    head_idx = len(_V3_SMALL_TABLE) + 1
    params["head_conv"] = {"kernel": _conv(sd, f"features.{head_idx}.0")}
    params["head_bn"], stats["head_bn"] = _bn(sd, f"features.{head_idx}.1")
    return {"params": params, "batch_stats": stats}


def _effnet_table(name):
    from vision_collision_detection_tpu.models.backbones.efficientnet import (
        _V2_L,
        _V2_M,
        _V2_S,
    )

    return {"efficientnet_v2_s": _V2_S, "efficientnet_v2_m": _V2_M,
            "efficientnet_v2_l": _V2_L}[name][1]


_CONVERTERS = {
    "resnet18": lambda sd: convert_resnet(sd, (2, 2, 2, 2), False),
    "resnet50": lambda sd: convert_resnet(sd, (3, 4, 6, 3), True),
    "convnext_tiny": lambda sd: convert_convnext(sd, (3, 3, 9, 3)),
    "convnext_base": lambda sd: convert_convnext(sd, (3, 3, 27, 3)),
    "convnext_large": lambda sd: convert_convnext(sd, (3, 3, 27, 3)),
    "mobilenet_v2": convert_mobilenet_v2,
    "mobilenet_v3_small": convert_mobilenet_v3_small,
    "efficientnet_v2_s": lambda sd: convert_efficientnet_v2(
        sd, _effnet_table("efficientnet_v2_s")),
    "efficientnet_v2_m": lambda sd: convert_efficientnet_v2(
        sd, _effnet_table("efficientnet_v2_m")),
    "efficientnet_v2_l": lambda sd: convert_efficientnet_v2(
        sd, _effnet_table("efficientnet_v2_l")),
}


# Vendored torchvision state_dict manifests (key → shape for every
# parameter+buffer of the 10 backbones the reference loads,
# /root/reference/nexar_arch.py:289-341). Generated by
# scripts/gen_torchvision_manifests.py and validated by exactly matching
# torchvision's published per-model parameter counts.
MANIFEST_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "manifests")


def load_manifest(backbone: str) -> Dict[str, tuple]:
    import json

    with open(os.path.join(MANIFEST_DIR, f"{backbone}.json")) as f:
        return {k: tuple(v) for k, v in json.load(f)["keys"].items()}


def _head_or_buffer(backbone: str, key: str) -> bool:
    """Keys legitimately absent/ignored: the ImageNet classification head
    (the reference strips it) and BatchNorm step counters."""
    if key.endswith("num_batches_tracked"):
        return True
    if backbone.startswith("convnext"):
        # classifier.0 is the feature-path LayerNorm2d; only the fc is head
        return key.startswith("classifier.2")
    return key.startswith("fc.") or key.startswith("classifier.")


def validate_state_dict(state_dict: Dict, backbone: str) -> None:
    """Check an incoming torchvision state_dict against the vendored
    manifest; raise with an actionable message on missing/unexpected keys
    or shape mismatches (instead of a bare KeyError mid-conversion)."""
    manifest = load_manifest(backbone)
    keys = set(state_dict.keys())
    required = {k for k in manifest if not _head_or_buffer(backbone, k)}
    missing = sorted(required - keys)
    unexpected = sorted(
        k for k in keys - set(manifest)
        if not _head_or_buffer(backbone, k)
    )
    problems = []
    if missing:
        problems.append(f"{len(missing)} missing keys, e.g. {missing[:5]}")
    if unexpected:
        problems.append(
            f"{len(unexpected)} unexpected keys, e.g. {unexpected[:5]}")
    for k in sorted(required & keys):
        got = tuple(getattr(state_dict[k], "shape", ()))
        if got != manifest[k]:
            problems.append(f"shape mismatch at {k}: {got} vs "
                            f"torchvision {manifest[k]}")
            break
    if problems:
        raise ValueError(
            f"state_dict does not match the torchvision {backbone!r} "
            f"layout: " + "; ".join(problems) +
            ". Expected a torchvision classification checkpoint "
            "(strict layout vendored in models/manifests/).")


def convert_torch_state_dict(state_dict: Dict, backbone: str,
                             validate: bool = False) -> Dict:
    """→ {"params": ..., "batch_stats": ...} for the named flax backbone.

    validate=True checks the incoming keys/shapes against the vendored
    torchvision manifest first (clear errors at import time; the offline
    CLI enables this)."""
    if backbone not in _CONVERTERS:
        raise NotImplementedError(
            f"no converter for {backbone!r}; available: {sorted(_CONVERTERS)}"
        )
    if validate:
        validate_state_dict(state_dict, backbone)
    return _CONVERTERS[backbone](state_dict)


def save_npz(tree: Dict, path: str) -> None:
    flat = _flatten(tree)
    np.savez(path, **flat)


def load_npz(path: str) -> Dict:
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    return _unflatten(flat)


def _flatten(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    tree: Dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def convert_checkpoint_file(pth_path: str, backbone: str, out_path: str) -> str:
    """Offline CLI helper: torch .pth → flax .npz (manifest-validated)."""
    import torch

    sd = torch.load(pth_path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    tree = convert_torch_state_dict(sd, backbone, validate=True)
    save_npz(tree, out_path)
    return out_path
