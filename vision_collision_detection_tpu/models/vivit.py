"""Factorized space-time video transformer (ViViT-style) — the scaled variant.

BASELINE.json config 5 calls for a "ViViT/VideoMAE-style" backbone at
32-frame 336 px for hard collision cases. The reference has no transformer
video model (its ceiling is per-frame CNN + temporal head); this is the
TPU-first scaled design: a factorized encoder — per-frame spatial attention,
then temporal attention over per-frame summaries — whose attention and MLP
matmuls map directly onto the MXU and shard cleanly over a ('data','model')
mesh (heads/MLP on the model axis).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from vision_collision_detection_tpu.config import ModelConfig
from vision_collision_detection_tpu.models.video_classifier import (
    canonicalize_video_layout,
)


class TransformerBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: int = 4
    dropout: float = 0.0
    dtype: Any = jnp.bfloat16
    attention_impl: str = "xla"  # "xla" | "flash" (ops/flash_attention.py)

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        if self.attention_impl == "flash":
            if self.dropout:
                raise ValueError("flash attention has no attention-dropout; "
                                 "use attention_impl='xla' or dropout=0")
            from vision_collision_detection_tpu.ops.flash_attention import (
                FlashSelfAttention,
            )

            h = FlashSelfAttention(
                num_heads=self.num_heads, dtype=self.dtype, name="attn",
            )(h, train)
        else:
            h = nn.MultiHeadDotProductAttention(
                num_heads=self.num_heads, dtype=self.dtype,
                dropout_rate=self.dropout, deterministic=not train,
                name="attn",
            )(h, h)
        x = x + h
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=True)
        h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(h)
        return x + h


class ViViT(nn.Module):
    """Factorized encoder: spatial blocks per frame → temporal blocks."""

    dim: int = 384
    spatial_layers: int = 8
    temporal_layers: int = 4
    num_heads: int = 6
    patch_size: int = 14
    num_classes: int = 3
    max_frames: int = 64
    dropout: float = 0.0
    remat: bool = False  # rematerialize blocks (32-frame 336px training)
    dtype: Any = jnp.bfloat16
    attention_impl: str = "xla"

    @nn.compact
    def __call__(self, frames, train: bool = False):
        x = canonicalize_video_layout(frames).astype(self.dtype)
        B, T, H, W, C = x.shape
        P = self.patch_size
        if H % P or W % P:
            raise ValueError(f"image size {(H, W)} not divisible by patch {P}")

        # Per-frame patchify: one big conv over B·T frames.
        flat = x.reshape(B * T, H, W, C)
        tokens = nn.Conv(self.dim, (P, P), strides=(P, P), dtype=self.dtype,
                         name="patch_embed")(flat)
        n_patches = (H // P) * (W // P)
        tokens = tokens.reshape(B * T, n_patches, self.dim)

        spatial_pos = self.param(
            "spatial_pos", nn.initializers.normal(0.02), (n_patches, self.dim)
        )
        tokens = tokens + spatial_pos.astype(self.dtype)
        # jax.checkpoint per block trades FLOPs for activation memory — at
        # 32 frames × (336/14)² = 576 tokens the spatial activations dominate
        block_cls = (nn.remat(TransformerBlock, static_argnums=(2,))
                     if self.remat else TransformerBlock)
        for i in range(self.spatial_layers):
            tokens = block_cls(
                dim=self.dim, num_heads=self.num_heads, dropout=self.dropout,
                dtype=self.dtype, attention_impl=self.attention_impl,
                name=f"spatial_{i}",
            )(tokens, train)
        tokens = nn.LayerNorm(dtype=self.dtype, name="spatial_norm")(tokens)

        # Per-frame summary → temporal sequence [B, T, dim].
        frame_repr = jnp.mean(tokens, axis=1).reshape(B, T, self.dim)
        if T > self.max_frames:
            raise ValueError(f"T={T} exceeds max_frames={self.max_frames}")
        temporal_pos = self.param(
            "temporal_pos", nn.initializers.normal(0.02),
            (self.max_frames, self.dim),
        )
        frame_repr = frame_repr + temporal_pos[:T].astype(self.dtype)
        for i in range(self.temporal_layers):
            frame_repr = TransformerBlock(
                dim=self.dim, num_heads=self.num_heads, dropout=self.dropout,
                dtype=self.dtype, name=f"temporal_{i}",
            )(frame_repr, train=train)
        frame_repr = nn.LayerNorm(dtype=self.dtype, name="temporal_norm")(frame_repr)

        pooled = jnp.mean(frame_repr, axis=1)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(
            pooled.astype(jnp.float32)
        )
        return logits


_VIVIT_SIZES = {
    # tiny: CI / dryrun preset — exercises the production construction path
    # (config → build_vivit) at compile-in-seconds scale
    "vivit_tiny": dict(dim=64, spatial_layers=2, temporal_layers=1, num_heads=4),
    "vivit_small": dict(dim=384, spatial_layers=8, temporal_layers=4, num_heads=6),
    "vivit_base": dict(dim=768, spatial_layers=12, temporal_layers=4, num_heads=12),
}


def build_vivit(cfg: ModelConfig) -> ViViT:
    sizes = _VIVIT_SIZES[cfg.backbone]
    return ViViT(
        num_classes=cfg.num_classes,
        patch_size=cfg.patch_size,
        dropout=0.0,
        remat=cfg.remat,
        dtype=jnp.dtype(cfg.dtype),
        attention_impl=cfg.attention_impl,
        **sizes,
    )
