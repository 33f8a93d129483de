"""MobileNetV2 / MobileNetV3-Small frame backbones (flax.linen, NHWC).

Parity with the reference's torchvision mobilenet_v2 / mobilenet_v3_small
choices (/root/reference/nexar_arch.py:4-15). Table-driven inverted-residual
stacks; squeeze-excite + hardswish for v3.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from vision_collision_detection_tpu.models.backbones import BACKBONE_REGISTRY


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def hardswish(x):
    return x * nn.relu6(x + 3.0) / 6.0


def hardsigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


class SqueezeExcite(nn.Module):
    channels: int
    squeeze: int
    gate: Any = hardsigmoid
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.squeeze, (1, 1), dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(self.channels, (1, 1), dtype=self.dtype, name="fc2")(s)
        return x * self.gate(s).astype(x.dtype)


class InvertedResidual(nn.Module):
    """MBConv block shared by MobileNetV2/V3."""

    out_ch: int
    exp_ch: int
    kernel: int = 3
    strides: int = 1
    use_se: bool = False
    se_squeeze: int = 0
    act: Any = nn.relu6
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-3, dtype=self.dtype)
        in_ch = x.shape[-1]
        y = x
        if self.exp_ch != in_ch:
            y = nn.Conv(self.exp_ch, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand_conv")(y)
            y = norm(name="expand_bn")(y)
            y = self.act(y)
        y = nn.Conv(self.exp_ch, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides),
                    padding=self.kernel // 2, feature_group_count=self.exp_ch,
                    use_bias=False, dtype=self.dtype, name="dw_conv")(y)
        y = norm(name="dw_bn")(y)
        y = self.act(y)
        if self.use_se:
            y = SqueezeExcite(self.exp_ch, self.se_squeeze, dtype=self.dtype,
                              name="se")(y)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(y)
        y = norm(name="project_bn")(y)
        if self.strides == 1 and in_ch == self.out_ch:
            y = y + x
        return y


# (expand_ratio, out_ch, repeats, stride) — standard MobileNetV2 table
_V2_TABLE = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


class MobileNetV2(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-3, dtype=self.dtype)
        x = x.astype(self.dtype)
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = norm(name="stem_bn")(x)
        x = nn.relu6(x)
        blk_idx = 0
        for t, c, n, s in _V2_TABLE:
            for i in range(n):
                in_ch = x.shape[-1]
                x = InvertedResidual(
                    out_ch=c, exp_ch=in_ch * t, kernel=3,
                    strides=s if i == 0 else 1, act=nn.relu6,
                    dtype=self.dtype, name=f"block{blk_idx}",
                )(x, train=train)
                blk_idx += 1
        x = nn.Conv(1280, (1, 1), use_bias=False, dtype=self.dtype,
                    name="head_conv")(x)
        x = norm(name="head_bn")(x)
        x = nn.relu6(x)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)


# (kernel, exp_ch, out_ch, use_se, use_hs, stride) — MobileNetV3-Small table
_V3_SMALL_TABLE = (
    (3, 16, 16, True, False, 2),
    (3, 72, 24, False, False, 2),
    (3, 88, 24, False, False, 1),
    (5, 96, 40, True, True, 2),
    (5, 240, 40, True, True, 1),
    (5, 240, 40, True, True, 1),
    (5, 120, 48, True, True, 1),
    (5, 144, 48, True, True, 1),
    (5, 288, 96, True, True, 2),
    (5, 576, 96, True, True, 1),
    (5, 576, 96, True, True, 1),
)


class MobileNetV3Small(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.99, epsilon=1e-3, dtype=self.dtype)
        x = x.astype(self.dtype)
        x = nn.Conv(16, (3, 3), strides=(2, 2), padding=1, use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = norm(name="stem_bn")(x)
        x = hardswish(x)
        for idx, (k, exp, out, se, hs, s) in enumerate(_V3_SMALL_TABLE):
            x = InvertedResidual(
                out_ch=out, exp_ch=exp, kernel=k, strides=s, use_se=se,
                se_squeeze=_make_divisible(exp // 4),
                act=hardswish if hs else nn.relu,
                dtype=self.dtype, name=f"block{idx}",
            )(x, train=train)
        x = nn.Conv(576, (1, 1), use_bias=False, dtype=self.dtype,
                    name="head_conv")(x)
        x = norm(name="head_bn")(x)
        x = hardswish(x)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)


@BACKBONE_REGISTRY.register("mobilenet_v2")
def mobilenet_v2(dtype=None, **kwargs):
    return MobileNetV2(dtype=dtype or jnp.bfloat16, **kwargs)


@BACKBONE_REGISTRY.register("mobilenet_v3_small")
def mobilenet_v3_small(dtype=None, **kwargs):
    return MobileNetV3Small(dtype=dtype or jnp.bfloat16, **kwargs)
