"""ConvNeXt tiny/base/large frame backbones (flax.linen, NHWC).

The reference's default backbone family (/root/reference/nexar_arch.py:4-15;
convnext_tiny is the CLI default at /root/reference/nexar_train_distributed.py:67).
LayerNorm-only (no batch stats) — the most TPU/pjit-friendly of the menu, and
the performance default here. Depthwise 7x7 convs lower to efficient XLA
convolutions; the pointwise MLPs are MXU matmuls over the channel dim.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from vision_collision_detection_tpu.models.backbones import BACKBONE_REGISTRY
# module (not from-import) references: the *_DEFAULT toggles are read at
# call time so A/B harnesses (scripts/profile_train.py) can flip them by
# mutating the ops modules — flax module dataclass defaults are baked at
# class creation, so class-attribute assignment cannot override them.
from vision_collision_detection_tpu.ops import convnext_mlp_pallas as _fused
from vision_collision_detection_tpu.ops import dwconv_pallas as _dw
from vision_collision_detection_tpu.ops.convnext_mlp_pallas import (
    convnext_mlp_block,
)
from vision_collision_detection_tpu.ops.dwconv_pallas import dwconv7x7


class _LayerNormParams(nn.Module):
    """Declares {scale, bias} with nn.LayerNorm's tree/init and returns the
    raw values — lets the fused-MLP path consume params that stay
    checkpoint-identical to the unfused nn.LayerNorm path."""

    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.dim,)),
                self.param("bias", nn.initializers.zeros, (self.dim,)))


class _DenseParams(nn.Module):
    """{kernel, bias} with nn.Dense's tree/init, returned as raw values."""

    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self):
        return (self.param("kernel", nn.initializers.lecun_normal(),
                           (self.in_dim, self.out_dim)),
                self.param("bias", nn.initializers.zeros, (self.out_dim,)))


class DwConv7x7(nn.Module):
    """Depthwise 7x7 with the same param tree as nn.Conv(name='dwconv')
    ({kernel [7,7,1,C], bias [C]}) but computed by the Pallas VPU kernel
    (ops/dwconv_pallas.py) — XLA's grouped-conv lowering ran at ~1.8 TFLOP/s
    on this chip (PROFILE_r03.json)."""

    dim: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (7, 7, 1, self.dim))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return dwconv7x7(x.astype(self.dtype),
                         kernel[:, :, 0, :].astype(self.dtype),
                         bias.astype(self.dtype))


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6
    drop_path_rate: float = 0.0
    # tanh-approx GELU: cheaper fused elementwise on the VPU; exact erf is
    # kept as default for torchvision-checkpoint numerical parity
    gelu_approximate: bool = False
    # None = module default (XLA path; the pallas kernel measured slower —
    # see ops/dwconv_pallas.py); explicit bool overrides for experiments
    dwconv_pallas: Any = None
    # None = module default (ops/convnext_mlp_pallas.FUSED_MLP_DEFAULT):
    # the fused LN+MLP+scale+residual Pallas kernel. Falls back to the
    # unfused path when stochastic depth is active (the residual add must
    # stay outside the kernel for per-sample drop masks).
    fused_mlp: Any = None
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        # depthwise 7x7
        use_pallas = (self.dwconv_pallas if self.dwconv_pallas is not None
                      else _dw.PALLAS_DWCONV_DEFAULT)
        if use_pallas:
            y = DwConv7x7(dim=self.dim, dtype=self.dtype, name="dwconv")(x)
        else:
            y = nn.Conv(self.dim, (7, 7), padding=3,
                        feature_group_count=self.dim,
                        dtype=self.dtype, name="dwconv")(x)
        gamma = self.param(
            "gamma", nn.initializers.constant(self.layer_scale_init), (self.dim,)
        )
        # Explicit fused_mlp=True/False always wins (tests, experiments).
        # The module default additionally gates on channel count: at
        # stage-0/1 dims both impls are HBM-bound and XLA is faster; the
        # kernel wins from C>=FUSED_MLP_MIN_DIM (measured per-stage in
        # scripts/bench_fused_mlp.py).
        if self.fused_mlp is not None:
            use_fused = bool(self.fused_mlp)
        else:
            use_fused = (_fused.FUSED_MLP_DEFAULT
                         and self.dim >= _fused.FUSED_MLP_MIN_DIM)
        drop_path_active = train and self.drop_path_rate > 0.0
        if use_fused and not drop_path_active:
            ln_scale, ln_bias = _LayerNormParams(dim=self.dim, name="norm")()
            w1, b1 = _DenseParams(in_dim=self.dim, out_dim=4 * self.dim,
                                  name="pwconv1")()
            w2, b2 = _DenseParams(in_dim=4 * self.dim, out_dim=self.dim,
                                  name="pwconv2")()
            # shortcut keeps its own dtype: the unfused path's residual add
            # promotes (f32 shortcut + bf16 branch → f32), and the kernel
            # writes its output in shortcut dtype to match.
            return convnext_mlp_block(
                shortcut, y.astype(self.dtype),
                ln_scale, ln_bias, w1, b1, w2, b2, gamma,
                self.gelu_approximate)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(y)
        y = nn.gelu(y, approximate=self.gelu_approximate)
        y = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(y)
        y = y * gamma.astype(self.dtype)
        if drop_path_active:
            keep = 1.0 - self.drop_path_rate
            rng = self.make_rng("dropout")
            mask = jax.random.bernoulli(rng, keep, (y.shape[0], 1, 1, 1))
            y = jnp.where(mask, y / keep, 0.0).astype(self.dtype)
        return shortcut + y


class ConvNeXt(nn.Module):
    """Returns pooled+normed features [N, D] from NHWC images."""

    depths: Sequence[int]
    dims: Sequence[int]
    drop_path_rate: float = 0.0
    # torchvision puts the final LayerNorm inside `classifier`; the reference's
    # EnhancedFrameCNN replaces classifier with Identity and therefore SKIPS it
    # (/root/reference/nexar_arch.py:324-328). apply_head_norm=False reproduces
    # that feature path for imported checkpoints.
    apply_head_norm: bool = True
    gelu_approximate: bool = False
    dwconv_pallas: Any = None
    fused_mlp: Any = None
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        # stem: 4x4 stride-4 patchify + LN
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), dtype=self.dtype,
                    name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)

        total_blocks = sum(self.depths)
        block_idx = 0
        for stage in range(len(self.depths)):
            if stage > 0:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"downsample{stage}_norm")(x)
                x = nn.Conv(self.dims[stage], (2, 2), strides=(2, 2),
                            dtype=self.dtype, name=f"downsample{stage}_conv")(x)
            for blk in range(self.depths[stage]):
                dp = self.drop_path_rate * block_idx / max(total_blocks - 1, 1)
                x = ConvNeXtBlock(
                    dim=self.dims[stage], drop_path_rate=dp, dtype=self.dtype,
                    gelu_approximate=self.gelu_approximate,
                    dwconv_pallas=self.dwconv_pallas,
                    fused_mlp=self.fused_mlp,
                    name=f"stage{stage}_block{blk}",
                )(x, train=train)
                block_idx += 1

        x = jnp.mean(x, axis=(1, 2))  # global average pool
        if self.apply_head_norm:
            x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                             name="head_norm")(x.astype(jnp.float32))
        return x.astype(jnp.float32)


@BACKBONE_REGISTRY.register("convnext_tiny")
def convnext_tiny(dtype=None, **kwargs):
    return ConvNeXt(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768),
                    dtype=dtype or jnp.bfloat16, **kwargs)


@BACKBONE_REGISTRY.register("convnext_base")
def convnext_base(dtype=None, **kwargs):
    return ConvNeXt(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024),
                    dtype=dtype or jnp.bfloat16, **kwargs)


@BACKBONE_REGISTRY.register("convnext_large")
def convnext_large(dtype=None, **kwargs):
    return ConvNeXt(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536),
                    dtype=dtype or jnp.bfloat16, **kwargs)
