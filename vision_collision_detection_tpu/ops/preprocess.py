"""End-to-end device preprocessing: uint8 decode output → model-ready bf16.

Replaces the reference's per-frame CPU transform stack
(/root/reference/nexar_video_aug.py:804-822 wrapper: /255 → letterbox →
hflip → VideoAugmentation → normalize) with ONE jitted program per mode.
uint8 crosses the host→device boundary (4× less PCIe/HBM traffic than
fp32); everything after is fused on-device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vision_collision_detection_tpu.config import AugmentConfig
from vision_collision_detection_tpu.ops.augment import augment_batch
from vision_collision_detection_tpu.ops.letterbox import letterbox_resize


def normalize_video(x: jax.Array, mean, std) -> jax.Array:
    mean = jnp.asarray(mean, dtype=x.dtype)
    std = jnp.asarray(std, dtype=x.dtype)
    return (x - mean) / std


def train_preprocess(key, frames_u8, cfg: AugmentConfig, target_size: int,
                     out_dtype=jnp.bfloat16):
    """Traceable body: (key, uint8 [B,T,H,W,C]) → normalized [B,T,S,S,C].

    Called inline from the jitted train step so decode output → augmented
    bf16 → forward is ONE XLA program with no HBM round-trip.
    """
    b = frames_u8.shape[0]
    k_flip, k_aug = jax.random.split(key)
    flip = None
    if cfg.horizontal_flip_prob > 0:
        flip = jax.random.bernoulli(
            k_flip, cfg.horizontal_flip_prob, (b, 1, 1, 1, 1)
        )
    # Flip on the UINT8 tensor when the width needs no padding (the
    # content-box/pre-sized path): same result as the reference's
    # post-letterbox hflip, at 1/4 the bytes — the float-tensor reverse
    # showed up at ~2 ms/step in PROFILE_r03.
    flip_u8 = flip is not None and frames_u8.shape[-2] == target_size
    if flip_u8:
        frames_u8 = jnp.where(flip, frames_u8[:, :, :, ::-1, :], frames_u8)
    x = frames_u8.astype(jnp.float32) / 255.0
    x = letterbox_resize(x, target_size)
    if flip is not None and not flip_u8:
        x = jnp.where(flip, x[:, :, :, ::-1, :], x)
    if cfg.enabled:
        x = augment_batch(k_aug, x, cfg)
    x = normalize_video(x, cfg.normalize_mean, cfg.normalize_std)
    return x.astype(out_dtype)


def eval_preprocess(frames_u8, cfg: AugmentConfig, target_size: int,
                    out_dtype=jnp.bfloat16, use_pallas: str = "auto"):
    """Traceable body for the val transform (mode='val': letterbox +
    normalize only, /root/reference/nexar_video_aug.py:636-700 with
    enable_custom_augmentation=False).

    When the input is already content-sized (decoder shipped letterbox
    content rows) the whole op is a single fused Pallas kernel on TPU
    (dequant + normalize + pad, one VMEM pass)."""
    h, w = frames_u8.shape[-3], frames_u8.shape[-2]
    content_sized = (
        frames_u8.dtype == jnp.uint8
        and h <= target_size and w <= target_size
        and (h == target_size or w == target_size)
    )
    if content_sized and use_pallas != "never":
        from vision_collision_detection_tpu.ops.pallas_ops import (
            fused_dequant_normalize_pad,
            pallas_available,
        )

        if use_pallas == "force" or pallas_available():
            return fused_dequant_normalize_pad(
                frames_u8, target_size, cfg.normalize_mean,
                cfg.normalize_std, out_dtype,
                interpret=not pallas_available(),
            )
    x = frames_u8.astype(jnp.float32) / 255.0
    x = letterbox_resize(x, target_size)
    x = normalize_video(x, cfg.normalize_mean, cfg.normalize_std)
    return x.astype(out_dtype)


def make_train_preprocess(cfg: AugmentConfig, target_size: int,
                          out_dtype=jnp.bfloat16):
    """Standalone jitted train transform (for pipelines that pre-process)."""
    return jax.jit(
        lambda key, frames: train_preprocess(key, frames, cfg, target_size,
                                             out_dtype)
    )


def make_eval_preprocess(cfg: AugmentConfig, target_size: int,
                         out_dtype=jnp.bfloat16):
    """Standalone jitted eval transform."""
    return jax.jit(
        lambda frames: eval_preprocess(frames, cfg, target_size, out_dtype)
    )
