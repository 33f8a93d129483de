"""Converters vs vendored torchvision state_dict manifests.

torchvision is not installed in this environment; all previous converter
parity was proven against hand-built torch mirrors. These tests pin the
converters to the REAL torchvision key universe instead: each fixture in
vision_collision_detection_tpu/models/manifests/ lists every state_dict key and shape
of one of the 10 pretrained backbones the reference loads
(/root/reference/nexar_arch.py:289-341), validated out-of-band by exactly
matching torchvision's published per-model parameter counts
(scripts/gen_torchvision_manifests.py). The assertions:

1. the converter reads EVERY manifest key except the documented
   exclusions (classification head the reference strips, BN bookkeeping
   buffers) — a torchvision layout with extra modules would fail loudly
   at import time, not silently at customer time;
2. the converter never asks for a key that torchvision does not ship;
3. the converted tree's leaf shapes exactly match our flax backbone's
   ``init`` structure (via jax.eval_shape — no big allocations).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_collision_detection_tpu.models.backbones import build_backbone
from vision_collision_detection_tpu.models.convert import (
    convert_torch_state_dict,
)

from vision_collision_detection_tpu.models.convert import MANIFEST_DIR

FIXTURE_DIR = MANIFEST_DIR

BACKBONES = [
    "resnet18", "resnet50",
    "convnext_tiny", "convnext_base", "convnext_large",
    "mobilenet_v2", "mobilenet_v3_small",
    "efficientnet_v2_s", "efficientnet_v2_m", "efficientnet_v2_l",
]

# Keys the converter legitimately does not consume: the ImageNet
# classification head (the reference replaces it,
# /root/reference/nexar_arch.py:289-341 swaps fc/classifier for Identity)
# and BatchNorm step counters. ConvNeXt's classifier.0 is the final
# LayerNorm2d on the feature path and IS consumed (as head_norm).
def _expected_unconsumed(name, key):
    if key.endswith("num_batches_tracked"):
        return True
    if name.startswith("convnext"):
        return key.startswith("classifier.2")
    return key.startswith("fc.") or key.startswith("classifier.")


class RecordingDict(dict):
    """state_dict stand-in that records every key the converter reads."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.read = set()

    def __getitem__(self, k):
        self.read.add(k)
        return super().__getitem__(k)


def _load(name):
    with open(os.path.join(FIXTURE_DIR, f"{name}.json")) as f:
        doc = json.load(f)
    return {k: tuple(v) for k, v in doc["keys"].items()}


@pytest.mark.parametrize("name", BACKBONES)
def test_converter_consumes_exact_torchvision_manifest(name):
    manifest = _load(name)
    sd = RecordingDict({k: np.zeros(s, np.float32)
                        for k, s in manifest.items()})
    tree = convert_torch_state_dict(sd, name)  # KeyError == unexpected key

    expected = {k for k in manifest if not _expected_unconsumed(name, k)}
    missing = expected - sd.read
    assert not missing, (
        f"{name}: converter silently ignored {len(missing)} torchvision "
        f"keys, e.g. {sorted(missing)[:5]}")
    stray = sd.read - set(manifest)
    assert not stray, f"{name}: converter read non-torchvision keys {stray}"
    assert tree["params"]


@pytest.mark.parametrize("name", BACKBONES)
def test_converted_shapes_match_flax_init(name):
    manifest = _load(name)
    sd = {k: np.zeros(s, np.float32) for k, s in manifest.items()}
    tree = convert_torch_state_dict(sd, name)

    net = build_backbone(name, dtype=jnp.float32)
    shapes = jax.eval_shape(
        lambda: net.init({"params": jax.random.PRNGKey(0)},
                         jnp.zeros((1, 64, 64, 3)), train=False))

    def flat(d, prefix=""):
        out = {}
        for k, v in d.items():
            key = f"{prefix}/{k}" if prefix else str(k)
            if isinstance(v, dict):
                out.update(flat(v, key))
            else:
                out[key] = tuple(v.shape)
        return out

    init_flat = flat(jax.tree.map(lambda x: x, shapes["params"],
                                  is_leaf=lambda x: hasattr(x, "shape")))
    conv_flat = flat(tree["params"])
    # head_norm exists in the torchvision tree but our backbone only
    # instantiates it when apply_head_norm is on; compare the intersection
    # plus assert the converted tree covers every init param.
    missing = set(init_flat) - set(conv_flat)
    assert not missing, f"{name}: converter missing flax params {sorted(missing)[:5]}"
    for k in init_flat:
        assert conv_flat[k] == init_flat[k], (
            f"{name}: shape mismatch at {k}: converted {conv_flat[k]} "
            f"vs flax init {init_flat[k]}")

    if "batch_stats" in shapes:
        init_bs = flat(shapes["batch_stats"])
        conv_bs = flat(tree["batch_stats"])
        assert set(init_bs) <= set(conv_bs)
        for k in init_bs:
            assert conv_bs[k] == init_bs[k], f"{name}: batch_stats {k}"


def test_validate_state_dict_catches_problems():
    from vision_collision_detection_tpu.models.convert import (
        validate_state_dict,
    )

    good = {k: np.zeros(s, np.float32) for k, s in _load("resnet18").items()}
    validate_state_dict(good, "resnet18")  # exact layout passes
    validate_state_dict(  # head keys optional (the reference strips them)
        {k: v for k, v in good.items() if not k.startswith("fc.")},
        "resnet18")

    with pytest.raises(ValueError, match="missing"):
        bad = dict(good)
        del bad["layer2.0.conv1.weight"]
        validate_state_dict(bad, "resnet18")
    with pytest.raises(ValueError, match="unexpected"):
        validate_state_dict(dict(good, **{"layer9.0.conv1.weight":
                                          np.zeros((1,))}), "resnet18")
    with pytest.raises(ValueError, match="shape mismatch"):
        validate_state_dict(dict(good, **{"conv1.weight":
                                          np.zeros((64, 3, 3, 3))}),
                            "resnet18")
