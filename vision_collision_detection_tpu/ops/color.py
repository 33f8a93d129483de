"""Color ops on [0,1] float RGB, torchvision-compatible semantics.

These reproduce the behaviors the reference reaches through
``torchvision.transforms.functional`` (/root/reference/nexar_video_aug.py:
222-268): adjust_brightness/contrast/saturation/hue, rgb_to_grayscale,
solarize, posterize, invert. All are shape-polymorphic elementwise programs
over [..., H, W, C]; XLA fuses the whole chain into one VPU pass.
"""

from __future__ import annotations

import jax.numpy as jnp

# ITU-R 601 luma weights (torchvision rgb_to_grayscale).
_LUMA = (0.2989, 0.587, 0.114)


def rgb_to_grayscale(x, keep_channels: bool = True):
    w = jnp.asarray(_LUMA, dtype=x.dtype)
    gray = jnp.tensordot(x, w, axes=([-1], [0]))[..., None]
    if keep_channels:
        gray = jnp.repeat(gray, x.shape[-1], axis=-1)
    return gray


def adjust_brightness(x, factor):
    return jnp.clip(x * factor, 0.0, 1.0)


def adjust_contrast(x, factor):
    # blend with the mean of the grayscale image (per image over H,W)
    gray = rgb_to_grayscale(x, keep_channels=False)
    mean = jnp.mean(gray, axis=(-3, -2, -1), keepdims=True)
    return jnp.clip(factor * x + (1.0 - factor) * mean, 0.0, 1.0)


def adjust_saturation(x, factor):
    gray = rgb_to_grayscale(x, keep_channels=True)
    return jnp.clip(factor * x + (1.0 - factor) * gray, 0.0, 1.0)


def rgb_to_hsv(x):
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    safe_delta = jnp.where(delta == 0, 1.0, delta)
    s = jnp.where(maxc == 0, 0.0, delta / jnp.where(maxc == 0, 1.0, maxc))
    rc = (maxc - r) / safe_delta
    gc = (maxc - g) / safe_delta
    bc = (maxc - b) / safe_delta
    h = jnp.where(
        maxc == r, bc - gc,
        jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc),
    )
    h = jnp.where(delta == 0, 0.0, h)
    h = (h / 6.0) % 1.0
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(x):
    h, s, v = x[..., 0], x[..., 1], x[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v]
    )
    g = jnp.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p]
    )
    b = jnp.select(
        [i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q]
    )
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue(x, shift):
    """shift ∈ [-0.5, 0.5] of the full hue cycle."""
    hsv = rgb_to_hsv(jnp.clip(x, 0.0, 1.0))
    h = (hsv[..., 0] + shift) % 1.0
    return hsv_to_rgb(jnp.stack([h, hsv[..., 1], hsv[..., 2]], axis=-1))


def solarize(x, threshold):
    return jnp.where(x >= threshold, 1.0 - x, x)


def posterize(x, bits):
    """Quantize to `bits` bits per channel (byte-domain semantics).

    ``bits`` may be a traced integer: shift = 8 - bits, mask the low bits of
    the byte value.
    """
    b = jnp.floor(jnp.clip(x, 0.0, 1.0) * 255.0).astype(jnp.int32)
    shift = (8 - bits).astype(jnp.int32) if hasattr(bits, "astype") else 8 - bits
    step = jnp.left_shift(1, shift)
    q = (b // step) * step
    return q.astype(x.dtype) / 255.0


def invert(x):
    return 1.0 - x
