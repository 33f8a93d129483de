"""EfficientNetV2 S/M/L frame backbones (flax.linen, NHWC).

Parity with the reference's torchvision efficientnet_v2_{s,m,l} choices
(/root/reference/nexar_arch.py:4-15). Fused-MBConv early stages (plain 3x3
convs — better MXU utilization than depthwise at small channel counts) and
SE-MBConv later stages, per the EfficientNetV2 recipe.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from vision_collision_detection_tpu.models.backbones import BACKBONE_REGISTRY
from vision_collision_detection_tpu.models.backbones.mobilenet import SqueezeExcite


class FusedMBConv(nn.Module):
    out_ch: int
    expand: int
    kernel: int = 3
    strides: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-3, dtype=self.dtype)
        in_ch = x.shape[-1]
        exp_ch = in_ch * self.expand
        y = x
        if self.expand != 1:
            y = nn.Conv(exp_ch, (self.kernel, self.kernel),
                        strides=(self.strides, self.strides),
                        padding=self.kernel // 2, use_bias=False,
                        dtype=self.dtype, name="expand_conv")(y)
            y = norm(name="expand_bn")(y)
            y = nn.silu(y)
            y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                        name="project_conv")(y)
            y = norm(name="project_bn")(y)
        else:
            y = nn.Conv(self.out_ch, (self.kernel, self.kernel),
                        strides=(self.strides, self.strides),
                        padding=self.kernel // 2, use_bias=False,
                        dtype=self.dtype, name="project_conv")(y)
            y = norm(name="project_bn")(y)
            y = nn.silu(y)
        if self.strides == 1 and in_ch == self.out_ch:
            y = y + x
        return y


class MBConvSE(nn.Module):
    out_ch: int
    expand: int
    kernel: int = 3
    strides: int = 1
    se_ratio: float = 0.25
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-3, dtype=self.dtype)
        in_ch = x.shape[-1]
        exp_ch = in_ch * self.expand
        y = nn.Conv(exp_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="expand_conv")(x)
        y = norm(name="expand_bn")(y)
        y = nn.silu(y)
        y = nn.Conv(exp_ch, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides),
                    padding=self.kernel // 2, feature_group_count=exp_ch,
                    use_bias=False, dtype=self.dtype, name="dw_conv")(y)
        y = norm(name="dw_bn")(y)
        y = nn.silu(y)
        y = SqueezeExcite(exp_ch, max(1, int(in_ch * self.se_ratio)),
                          gate=nn.sigmoid, dtype=self.dtype, name="se")(y)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(y)
        y = norm(name="project_bn")(y)
        if self.strides == 1 and in_ch == self.out_ch:
            y = y + x
        return y


# rows: (block_kind, expand, kernel, stride, out_ch, repeats)
_V2_S = (24, (
    ("fused", 1, 3, 1, 24, 2),
    ("fused", 4, 3, 2, 48, 4),
    ("fused", 4, 3, 2, 64, 4),
    ("mbconv", 4, 3, 2, 128, 6),
    ("mbconv", 6, 3, 1, 160, 9),
    ("mbconv", 6, 3, 2, 256, 15),
))
_V2_M = (24, (
    ("fused", 1, 3, 1, 24, 3),
    ("fused", 4, 3, 2, 48, 5),
    ("fused", 4, 3, 2, 80, 5),
    ("mbconv", 4, 3, 2, 160, 7),
    ("mbconv", 6, 3, 1, 176, 14),
    ("mbconv", 6, 3, 2, 304, 18),
    ("mbconv", 6, 3, 1, 512, 5),
))
_V2_L = (32, (
    ("fused", 1, 3, 1, 32, 4),
    ("fused", 4, 3, 2, 64, 7),
    ("fused", 4, 3, 2, 96, 7),
    ("mbconv", 4, 3, 2, 192, 10),
    ("mbconv", 6, 3, 1, 224, 19),
    ("mbconv", 6, 3, 2, 384, 25),
    ("mbconv", 6, 3, 1, 640, 7),
))


class EfficientNetV2(nn.Module):
    stem_ch: int
    table: Sequence[Tuple]
    head_ch: int = 1280
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-3, dtype=self.dtype)
        x = x.astype(self.dtype)
        x = nn.Conv(self.stem_ch, (3, 3), strides=(2, 2), padding=1,
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = norm(name="stem_bn")(x)
        x = nn.silu(x)
        blk_idx = 0
        for kind, expand, kernel, stride, out_ch, repeats in self.table:
            for i in range(repeats):
                cls = FusedMBConv if kind == "fused" else MBConvSE
                x = cls(out_ch=out_ch, expand=expand, kernel=kernel,
                        strides=stride if i == 0 else 1, dtype=self.dtype,
                        name=f"block{blk_idx}")(x, train=train)
                blk_idx += 1
        x = nn.Conv(self.head_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="head_conv")(x)
        x = norm(name="head_bn")(x)
        x = nn.silu(x)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)


@BACKBONE_REGISTRY.register("efficientnet_v2_s")
def efficientnet_v2_s(dtype=None, **kwargs):
    stem, table = _V2_S
    return EfficientNetV2(stem_ch=stem, table=table,
                          dtype=dtype or jnp.bfloat16, **kwargs)


@BACKBONE_REGISTRY.register("efficientnet_v2_m")
def efficientnet_v2_m(dtype=None, **kwargs):
    stem, table = _V2_M
    return EfficientNetV2(stem_ch=stem, table=table,
                          dtype=dtype or jnp.bfloat16, **kwargs)


@BACKBONE_REGISTRY.register("efficientnet_v2_l")
def efficientnet_v2_l(dtype=None, **kwargs):
    stem, table = _V2_L
    return EfficientNetV2(stem_ch=stem, table=table,
                          dtype=dtype or jnp.bfloat16, **kwargs)
