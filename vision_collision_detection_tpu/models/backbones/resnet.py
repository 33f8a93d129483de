"""ResNet-18 / ResNet-50 frame backbones (flax.linen, NHWC).

Capability parity with the reference's torchvision resnet18/resnet50 choices
(/root/reference/nexar_arch.py:4-15,289-341); architecture follows the
standard ResNet v1 recipe so converted torchvision ImageNet weights load
1:1 (see vision_collision_detection_tpu.models.convert).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from vision_collision_detection_tpu.models.backbones import BACKBONE_REGISTRY


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(
            nn.BatchNorm, use_running_average=not train, momentum=0.9,
            epsilon=1e-5, dtype=self.dtype,
        )
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)

        residual = x
        y = conv(self.features, (3, 3), strides=(self.strides, self.strides),
                 padding=1, name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.features, (3, 3), padding=1, name="conv2")(y)
        y = norm(name="bn2")(y)

        if residual.shape != y.shape:
            residual = conv(self.features, (1, 1),
                            strides=(self.strides, self.strides),
                            name="downsample_conv")(residual)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int  # width of the 3x3; output is 4*features
    strides: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = partial(
            nn.BatchNorm, use_running_average=not train, momentum=0.9,
            epsilon=1e-5, dtype=self.dtype,
        )
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)

        residual = x
        y = conv(self.features, (1, 1), name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        y = conv(self.features, (3, 3), strides=(self.strides, self.strides),
                 padding=1, name="conv2")(y)
        y = norm(name="bn2")(y)
        y = nn.relu(y)
        y = conv(self.features * 4, (1, 1), name="conv3")(y)
        y = norm(name="bn3")(y)

        if residual.shape != y.shape:
            residual = conv(self.features * 4, (1, 1),
                            strides=(self.strides, self.strides),
                            name="downsample_conv")(residual)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Returns globally-pooled features [N, D] from NHWC images."""

    stage_sizes: Sequence[int]
    block: Any
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        for stage, num_blocks in enumerate(self.stage_sizes):
            for blk in range(num_blocks):
                strides = 2 if stage > 0 and blk == 0 else 1
                x = self.block(
                    features=64 * 2**stage, strides=strides, dtype=self.dtype,
                    name=f"layer{stage + 1}_{blk}",
                )(x, train=train)
        # global average pool → [N, D]
        x = jnp.mean(x, axis=(1, 2))
        return x.astype(jnp.float32)


@BACKBONE_REGISTRY.register("resnet18")
def resnet18(dtype=None, **kwargs):
    return ResNet(stage_sizes=(2, 2, 2, 2), block=BasicBlock,
                  dtype=dtype or jnp.bfloat16, **kwargs)


@BACKBONE_REGISTRY.register("resnet50")
def resnet50(dtype=None, **kwargs):
    return ResNet(stage_sizes=(3, 4, 6, 3), block=Bottleneck,
                  dtype=dtype or jnp.bfloat16, **kwargs)
