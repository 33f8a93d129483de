"""Affine warp (rotate / scale / shear / translate) with bilinear sampling.

Same parameterization the reference reaches through ``torchvision F.affine``
(/root/reference/nexar_video_aug.py:229-237): angle in degrees (CCW), scale
factor, x-shear in degrees, translation in pixels, pivot at the image center,
zero fill. One coordinate grid is computed per clip and shared by all T
frames (the clip-consistent augmentation contract), then applied as a
batched bilinear gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def affine_grid(h: int, w: int, angle_deg, translate_xy, scale, shear_deg):
    """Return (src_y, src_x) float grids [H, W]: output pixel → input coords.

    Inverse-mapping form of M = T(center+t) · R(angle) · Shear_x(shear) ·
    S(scale) · T(-center); rotation/shear have unit determinant so the
    inverse is the transposed cofactor matrix divided by scale.
    """
    rot = jnp.deg2rad(angle_deg)
    sx = jnp.deg2rad(shear_deg)
    cx = (w - 1) * 0.5
    cy = (h - 1) * 0.5
    tx, ty = translate_xy[0], translate_xy[1]

    # forward 2x2: R(rot) @ Shear_x(sx), then uniform scale
    a = jnp.cos(rot)
    b = -jnp.cos(rot) * jnp.tan(sx) - jnp.sin(rot)
    c = jnp.sin(rot)
    d = -jnp.sin(rot) * jnp.tan(sx) + jnp.cos(rot)
    # inverse (det == 1 before scale)
    ia, ib, ic, id_ = d, -b, -c, a

    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    dx = xs - cx - tx
    dy = ys - cy - ty
    src_x = (ia * dx + ib * dy) / scale + cx
    src_y = (ic * dx + id_ * dy) / scale + cy
    return src_y, src_x


def bilinear_sample(img: jax.Array, src_y: jax.Array, src_x: jax.Array):
    """img [H, W, C], grids [H', W'] → [H', W', C]; zero outside bounds."""
    h, w, _ = img.shape
    y0 = jnp.floor(src_y)
    x0 = jnp.floor(src_x)
    wy = (src_y - y0)[..., None]
    wx = (src_x - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def tap(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1)
        xc = jnp.clip(xi, 0, w - 1)
        vals = img[yc, xc]  # advanced indexing → gather
        return jnp.where(valid[..., None], vals, 0.0)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def affine_warp_clip(frames: jax.Array, angle_deg, translate_xy, scale,
                     shear_deg) -> jax.Array:
    """[T, H, W, C] → warped [T, H, W, C]; one grid shared across frames."""
    t, h, w, c = frames.shape
    src_y, src_x = affine_grid(h, w, angle_deg, translate_xy, scale, shear_deg)
    return jax.vmap(lambda f: bilinear_sample(f, src_y, src_x))(frames)
