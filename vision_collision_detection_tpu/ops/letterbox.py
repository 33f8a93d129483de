"""Letterbox resize: aspect-preserving scale + centered zero padding.

Reproduces the reference's letterbox arithmetic exactly
(/root/reference/nexar_video_aug.py:705-742): ``scale = min(S/h, S/w)``,
``new = int(dim * scale)`` (floor), centered placement at
``pad = (S - new) // 2``, black borders — but batched over [B,T] in one
jitted program instead of a Python loop of 50 per-frame resizes.

The resize itself is ``jax.image.resize(method='linear', antialias=True)``,
which lowers to per-axis interpolation-weight matmuls — MXU-friendly — and
matches torchvision's ``F.resize(antialias=True)`` filter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def letterbox_geometry(h: int, w: int, target_size: int):
    """(new_h, new_w, pad_h, pad_w) with the reference's int-floor arithmetic."""
    scale = min(target_size / h, target_size / w)
    new_h = int(h * scale)
    new_w = int(w * scale)
    pad_h = (target_size - new_h) // 2
    pad_w = (target_size - new_w) // 2
    return new_h, new_w, pad_h, pad_w


def letterbox_resize(frames: jax.Array, target_size: int) -> jax.Array:
    """[..., H, W, C] float → [..., S, S, C]; aspect preserved, black pad.

    H/W are static shapes, so the whole program (weights + pad) is traced
    once. No-ops when the input is already S×S.
    """
    *lead, h, w, c = frames.shape
    if h == target_size and w == target_size:
        return frames
    new_h, new_w, pad_h, pad_w = letterbox_geometry(h, w, target_size)
    resized = jax.image.resize(
        frames, (*lead, new_h, new_w, c), method="linear", antialias=True
    )
    pad_cfg = [(0, 0)] * len(lead) + [
        (pad_h, target_size - new_h - pad_h),
        (pad_w, target_size - new_w - pad_w),
        (0, 0),
    ]
    return jnp.pad(resized, pad_cfg)
