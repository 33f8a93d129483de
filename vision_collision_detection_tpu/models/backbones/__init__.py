"""Frame-backbone registry.

The reference selects among 10 torchvision backbones
(/root/reference/nexar_arch.py:4-15,289-341). Here each is a first-party
flax.linen module in NHWC layout (TPU-preferred), bf16 compute / fp32 params,
returning a pooled per-frame feature vector [N, D].
"""

from __future__ import annotations

from vision_collision_detection_tpu.utils.registry import Registry

BACKBONE_REGISTRY = Registry("backbone")

_FEATURE_DIMS = {
    "resnet18": 512,
    "resnet50": 2048,
    "mobilenet_v2": 1280,
    "mobilenet_v3_small": 576,
    "efficientnet_v2_s": 1280,
    "efficientnet_v2_m": 1280,
    "efficientnet_v2_l": 1280,
    "convnext_tiny": 768,
    "convnext_base": 1024,
    "convnext_large": 1536,
    "vivit_small": 384,
    "vivit_base": 768,
}


def feature_dim(name: str) -> int:
    if name not in _FEATURE_DIMS:
        raise KeyError(f"unknown backbone {name!r}; available: {sorted(_FEATURE_DIMS)}")
    return _FEATURE_DIMS[name]


def build_backbone(kind: str, dtype=None, **kwargs):
    """Instantiate a backbone module by registry key (lazily imports the
    family). Extra kwargs (e.g. flax ``name=``) pass through to the module."""
    # Import families for registration side effects.
    from vision_collision_detection_tpu.models.backbones import (  # noqa: F401
        convnext,
        efficientnet,
        mobilenet,
        resnet,
    )

    factory = BACKBONE_REGISTRY.get(kind)
    return factory(dtype=dtype, **kwargs)


__all__ = ["BACKBONE_REGISTRY", "feature_dim", "build_backbone"]
