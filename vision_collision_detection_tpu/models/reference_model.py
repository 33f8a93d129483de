"""Flax mirror of the reference's ``EnhancedFrameCNN`` for checkpoint import.

The reference's inference contract is: load a full training checkpoint,
rebuild the architecture from its ``hyperparams`` dict, swap the final
classifier layer to ``num_classes``, and run eval-mode forward
(/root/reference/nexar_inference.py:55-91). This module is that architecture
expressed in flax — frame backbone (classifier-free feature path) → one of
the reference-exact temporal heads → the reference classifier MLP
Linear(D,512)+BN+ReLU+Drop → Linear(512,256)+BN+ReLU+Drop → Linear(256,nc)
(/root/reference/nexar_arch.py:374-385) — so that weights converted by
``models/import_torch.py`` produce identical fp32 logits.

This is the *import/parity* model. The TPU-native flagship
(``VideoClassifierModel``) remains the training/performance default.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from vision_collision_detection_tpu.models.backbones import build_backbone
from vision_collision_detection_tpu.models.reference_heads import (
    build_reference_head,
)
from vision_collision_detection_tpu.models.video_classifier import (
    canonicalize_video_layout,
)


class ReferenceVideoClassifier(nn.Module):
    """EnhancedFrameCNN (/root/reference/nexar_arch.py:250-443) in flax.

    fp32 by default: the point of this model is numerical parity with torch
    checkpoints. Pass dtype=jnp.bfloat16 for fast TPU inference once parity
    is established.
    """

    backbone: str = "convnext_tiny"
    temporal_mode: str = "gru"
    num_classes: int = 3
    attention_heads: int = 4
    temporal_kernel_size: int = 3
    rnn_hidden_dim: int = 512
    rnn_num_layers: int = 2
    rnn_bidirectional: bool = True
    max_seq_length: int = 30
    dropout: float = 0.5
    frame_subsample: int = 2
    subsample_threshold: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, frames, train: bool = False):
        x = canonicalize_video_layout(frames)
        B, T = x.shape[0], x.shape[1]
        # Reference subsamples every 2nd frame when T > 10
        # (/root/reference/nexar_arch.py:412-415).
        if T > self.subsample_threshold and self.frame_subsample > 1:
            x = x[:, :: self.frame_subsample]
            T = x.shape[1]

        flat = x.reshape((B * T,) + x.shape[2:])
        kwargs = {}
        if self.backbone.startswith("convnext"):
            # classifier=Identity removes torchvision's final LayerNorm from
            # the feature path (/root/reference/nexar_arch.py:324-328).
            kwargs["apply_head_norm"] = False
        net = build_backbone(self.backbone, dtype=self.dtype, name="backbone",
                             **kwargs)
        feats = net(flat, train=train)  # [B·T, D] fp32
        D = feats.shape[-1]
        feats = feats.reshape(B, T, D).astype(self.dtype)

        head = build_reference_head(
            self.temporal_mode, D,
            num_heads=self.attention_heads,
            kernel=self.temporal_kernel_size,
            rnn_hidden=self.rnn_hidden_dim,
            rnn_layers=self.rnn_num_layers,
            bidirectional=self.rnn_bidirectional,
            max_seq_length=self.max_seq_length,
            dtype=self.dtype,
        )
        pooled = head(feats, train=train).astype(self.dtype)  # [B, D]

        # Reference classifier (/root/reference/nexar_arch.py:374-385).
        h = nn.Dense(512, dtype=self.dtype, name="fc1")(pooled)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train, name="drop1")(h)
        h = nn.Dense(256, dtype=self.dtype, name="fc2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn2")(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=not train, name="drop2")(h)
        logits = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc_out")(h)
        return logits.astype(jnp.float32)


def build_reference_model(hyperparams: dict, *, dtype=jnp.float32
                          ) -> ReferenceVideoClassifier:
    """Construct from a checkpoint ``hyperparams`` dict, with the reference's
    fallback defaults (/root/reference/nexar_inference.py:58-62)."""
    hp = dict(hyperparams or {})
    return ReferenceVideoClassifier(
        backbone=hp.get("base_model", "convnext_tiny"),
        temporal_mode=hp.get("temporal_mode", "gru"),
        num_classes=int(hp.get("num_classes", 3)),
        attention_heads=int(hp.get("attention_heads", 4)),
        temporal_kernel_size=int(hp.get("temporal_kernel_size", 3)),
        rnn_hidden_dim=int(hp.get("rnn_hidden_dim", 512)),
        rnn_num_layers=int(hp.get("rnn_num_layers", 2)),
        rnn_bidirectional=bool(hp.get("rnn_bidirectional", True)),
        dtype=dtype,
    )
