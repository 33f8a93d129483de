"""The flagship model: per-frame CNN backbone + temporal head + MLP classifier.

Capability parity with ``EnhancedFrameCNN``
(/root/reference/nexar_arch.py:250-443): layout auto-detect (:401-409),
frame subsample-by-k when T exceeds a threshold (:412-415), B·T flattening
through the 2-D backbone (:417-422), pluggable temporal aggregation
(:428-434), classifier MLP feat→512→256→num_classes (:374-385).

TPU-first shape discipline: everything is static-shape; the B·T flatten turns
per-frame CNN work into one large batched convolution program that XLA tiles
onto the MXU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from vision_collision_detection_tpu.config import ModelConfig
from vision_collision_detection_tpu.models.backbones import (
    build_backbone,
    feature_dim,
)
from vision_collision_detection_tpu.models.temporal import build_temporal_head


def canonicalize_video_layout(x):
    """Accept [B,T,H,W,C] (native) or [B,C,T,H,W] (reference torch layout).

    Mirrors the reference's auto-detect (/root/reference/nexar_arch.py:401-409):
    a channel-sized (1 or 3) axis in position 1 with a non-channel final axis
    means channels-first.
    """
    if x.ndim != 5:
        raise ValueError(f"expected 5-D video batch, got shape {x.shape}")
    if x.shape[1] in (1, 3) and x.shape[-1] not in (1, 3):
        x = jnp.transpose(x, (0, 2, 3, 4, 1))  # [B,C,T,H,W] → [B,T,H,W,C]
    return x


class VideoClassifierModel(nn.Module):
    backbone: str = "convnext_tiny"
    temporal_mode: str = "gru"
    num_classes: int = 3
    hidden_dim: int = 512
    temporal_hidden_dim: int = 256
    attention_heads: int = 4
    max_seq_length: int = 30
    bidirectional: bool = True
    dropout: float = 0.5
    use_sensor: bool = False
    sensor_hidden_dim: int = 64
    frame_subsample: int = 2
    subsample_threshold: int = 10
    gelu_approximate: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, frames, sensor=None, train: bool = False):
        x = canonicalize_video_layout(frames)
        B, T = x.shape[0], x.shape[1]
        if T > self.subsample_threshold and self.frame_subsample > 1:
            x = x[:, :: self.frame_subsample]
            T = x.shape[1]

        # [B,T,H,W,C] → [B·T,H,W,C]: one big per-frame CNN batch.
        flat = x.reshape((B * T,) + x.shape[2:])
        kw = ({"gelu_approximate": self.gelu_approximate}
              if self.backbone.startswith("convnext") else {})
        net = build_backbone(self.backbone, dtype=self.dtype, name="backbone",
                             **kw)
        feats = net(flat, train=train)  # [B·T, D] fp32
        D = feats.shape[-1]
        feats = feats.reshape(B, T, D)

        head = build_temporal_head(
            self.temporal_mode, D,
            hidden=self.temporal_hidden_dim,
            num_heads=self.attention_heads,
            max_seq_length=self.max_seq_length,
            bidirectional=self.bidirectional,
            dtype=self.dtype,
        )
        pooled = head(feats, train=train)  # [B, D_out] fp32

        if self.use_sensor:
            if sensor is None:
                raise ValueError("use_sensor=True but no sensor input given")
            # temporal encoding of the IMU stream [B, T_sensor, 4]:
            # two Dense layers over channels (MXU matmuls) then masked mean
            s = sensor.astype(self.dtype)
            s = nn.Dense(self.sensor_hidden_dim, dtype=self.dtype,
                         name="sensor_fc1")(s)
            s = nn.relu(s)
            s = nn.Dense(self.sensor_hidden_dim, dtype=self.dtype,
                         name="sensor_fc2")(s)
            s = jnp.mean(nn.relu(s), axis=1).astype(jnp.float32)
            pooled = jnp.concatenate([pooled, s], axis=-1)

        # Classifier MLP (reference nexar_arch.py:374-385).
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(pooled)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train, name="drop1")(h)
        h = nn.Dense(self.hidden_dim // 2, dtype=self.dtype, name="fc2")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train, name="drop2")(h)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc_out")(h)
        return logits.astype(jnp.float32)


def build_model(cfg: ModelConfig) -> nn.Module:
    if cfg.backbone.startswith("vivit"):
        from vision_collision_detection_tpu.models.vivit import build_vivit

        return build_vivit(cfg)
    return VideoClassifierModel(
        backbone=cfg.backbone,
        temporal_mode=cfg.temporal_mode,
        num_classes=cfg.num_classes,
        hidden_dim=cfg.hidden_dim,
        temporal_hidden_dim=cfg.temporal_hidden_dim,
        attention_heads=cfg.attention_heads,
        max_seq_length=cfg.max_seq_length,
        bidirectional=cfg.bidirectional,
        dropout=cfg.dropout,
        use_sensor=cfg.use_sensor,
        sensor_hidden_dim=cfg.sensor_hidden_dim,
        frame_subsample=cfg.frame_subsample,
        subsample_threshold=cfg.subsample_threshold,
        gelu_approximate=cfg.gelu_approximate,
        dtype=jnp.dtype(cfg.dtype),
    )
