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
    """[T, H, W, C] → warped [T, H, W, C]; one grid shared across frames.

    Direct 2-D bilinear sampling (4 taps per output pixel via gather) —
    the exact torchvision filter. On TPU the gathers run far below
    HBM bandwidth; prefer ``affine_warp_clip_separable`` on the training
    hot path (profiled 41% of the whole train step as gathers,
    PROFILE_r03.json).
    """
    t, h, w, c = frames.shape
    src_y, src_x = affine_grid(h, w, angle_deg, translate_xy, scale, shear_deg)
    return jax.vmap(lambda f: bilinear_sample(f, src_y, src_x))(frames)


# ---------------------------------------------------------------------------
# Separable (two-pass) warp: gathers → MXU matmuls
# ---------------------------------------------------------------------------
def _inverse_coeffs(h, w, angle_deg, translate_xy, scale, shear_deg):
    """src_x = m00·x + m01·y + ox ; src_y = m10·x + m11·y + oy
    (same inverse map as affine_grid, in explicit coefficient form)."""
    rot = jnp.deg2rad(angle_deg)
    sx = jnp.deg2rad(shear_deg)
    cx = (w - 1) * 0.5
    cy = (h - 1) * 0.5
    tx, ty = translate_xy[0], translate_xy[1]
    a = jnp.cos(rot)
    b = -jnp.cos(rot) * jnp.tan(sx) - jnp.sin(rot)
    c = jnp.sin(rot)
    d = -jnp.sin(rot) * jnp.tan(sx) + jnp.cos(rot)
    ia, ib, ic, id_ = d, -b, -c, a
    m00, m01 = ia / scale, ib / scale
    m10, m11 = ic / scale, id_ / scale
    ox = cx - (ia * (cx + tx) + ib * (cy + ty)) / scale
    oy = cy - (ic * (cx + tx) + id_ * (cy + ty)) / scale
    return (m00, m01, ox), (m10, m11, oy)


def _band_weights(coords: jax.Array, n_in: int, dtype) -> jax.Array:
    """[...]-shaped fractional source coords → [..., n_in] bilinear tap
    weights (triangle kernel, ≤2 nonzero per row, zero-fill out of bounds)."""
    xi = jnp.arange(n_in, dtype=jnp.float32)
    wgt = jnp.maximum(0.0, 1.0 - jnp.abs(coords[..., None] - xi))
    return wgt.astype(dtype)


def affine_warp_clip_separable(frames: jax.Array, angle_deg, translate_xy,
                               scale, shear_deg) -> jax.Array:
    """TPU-fast affine warp: two 1-D resampling passes as batched matmuls.

    The inverse map M factors (for m11 ≠ 0, i.e. |rotation| < 90°) into an
    x-only pass p(x, y) = δx + εy + ζ followed by a y-only pass
    q(y, x) = m10·x + m11·y + oy with ε = m01/m11, δ = m00 − ε·m10,
    ζ = ox − ε·oy. Each pass multiplies by a banded bilinear weight matrix —
    MXU work at ~50 GFLOP per 400-frame batch instead of 300 ms of per-pixel
    gathers (PROFILE_r03.json: the gather warp was 41% of the train step).

    Numerics: identical to the direct warp for axis-aligned transforms
    (scale/translate); for rotation/shear the two-pass filter samples along
    the slanted line instead of axis-parallel — sub-1% differences on
    natural images, irrelevant for augmentation. bf16 matmul operands with
    f32 accumulation.
    """
    t, h, w, c = frames.shape
    (m00, m01, ox), (m10, m11, oy) = _inverse_coeffs(
        h, w, angle_deg, translate_xy, scale, shear_deg)
    eps = m01 / m11
    delta = m00 - eps * m10
    zeta = ox - eps * oy

    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    # pass 1 — resample along x at integer rows: p[y, xo]
    p = delta * xs[None, :] + eps * ys[:, None] + zeta        # [H, W]
    wx = _band_weights(p, w, jnp.bfloat16)                    # [H, Wo, Wi]
    tmp = jnp.einsum(
        "yov,tyvc->tyoc", wx, frames.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    # pass 2 — resample along y per column: q[yo, x]
    q = m10 * xs[None, :] + m11 * ys[:, None] + oy            # [Ho, W]
    wy = _band_weights(q.T, h, jnp.bfloat16)                  # [W, Ho, Hi]
    out = jnp.einsum(
        "xji,tixc->tjxc", wy, tmp.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return out.astype(frames.dtype)
