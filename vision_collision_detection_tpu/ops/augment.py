"""Fused on-device video augmentation.

The reference samples params once per clip with Python ``random`` and then
loops over T frames applying torchvision ops one at a time on the CPU
(/root/reference/nexar_video_aug.py:97-182,200-315) — the #1 throughput
bottleneck. Here the whole pipeline is one jitted program over
[B, T, H, W, C]: per-clip PRNG keys drive param sampling (temporal
consistency for free), every op is batched over B·T, and XLA fuses the
elementwise chain into a single VPU pass between the two gathers
(affine warp) and the blur convolution.

Application order matches the reference (:222-274): color (brightness →
contrast → saturation → hue) → affine → grayscale → noise → blur →
posterize → solarize → invert → cutout. The per-clip skip gate
(reference :112-114) selects the untouched clip.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from vision_collision_detection_tpu.config import AugmentConfig
from vision_collision_detection_tpu.ops import color as C
from vision_collision_detection_tpu.ops.affine import (
    affine_warp_clip,
    affine_warp_clip_separable,
)


def _uniform(key, lo, hi):
    return jax.random.uniform(key, (), minval=lo, maxval=hi)


def sample_clip_params(key: jax.Array, cfg: AugmentConfig, h: int, w: int) -> Dict:
    """Sample one clip's augmentation params (reference :97-182)."""
    # One key per sampled decision: the reference draws every parameter
    # independently (/root/reference/nexar_video_aug.py:97-182), so no key may
    # serve two decisions (shared keys make equal-prob gates perfectly
    # correlated, e.g. invert⇔solarize).
    keys = jax.random.split(key, 21)
    k_max = int(cfg.cutout_count_range[1])

    size_f = jax.random.uniform(
        keys[9], (k_max,),
        minval=cfg.cutout_size_range[0], maxval=cfg.cutout_size_range[1],
    )
    cut_h = jnp.floor(h * size_f).astype(jnp.int32)
    cut_w = jnp.floor(w * size_f).astype(jnp.int32)
    max_top = jnp.maximum(h - cut_h - 1, 0)
    max_left = jnp.maximum(w - cut_w - 1, 0)
    u_top = jax.random.uniform(keys[10], (k_max,))
    u_left = jax.random.uniform(keys[11], (k_max,))

    return {
        "skip": jax.random.uniform(keys[0], ()) > cfg.aug_probability,
        "brightness": _uniform(keys[1], *cfg.brightness_range),
        "contrast": _uniform(keys[2], *cfg.contrast_range),
        "saturation": _uniform(keys[3], *cfg.saturation_range),
        "hue": _uniform(keys[4], *cfg.hue_range),
        "rotation": _uniform(keys[5], *cfg.rotation_range),
        "scale": _uniform(keys[6], *cfg.scale_range),
        "shear": _uniform(keys[7], *cfg.shear_range),
        # translation sign randomized over the full ±max range (reference :124-125)
        "translate": jnp.array([
            _uniform(keys[8], -cfg.translate_range[1], cfg.translate_range[1]) * w,
            _uniform(keys[15], -cfg.translate_range[1], cfg.translate_range[1]) * h,
        ]),
        "grayscale": jax.random.bernoulli(keys[12], cfg.grayscale_prob),
        "cutout": jax.random.bernoulli(keys[13], cfg.cutout_prob),
        "cutout_count": jax.random.randint(
            keys[16], (), cfg.cutout_count_range[0], cfg.cutout_count_range[1] + 1
        ),
        "cutout_h": cut_h,
        "cutout_w": cut_w,
        "cutout_top": jnp.floor(u_top * (max_top + 1).astype(jnp.float32)).astype(jnp.int32),
        "cutout_left": jnp.floor(u_left * (max_left + 1).astype(jnp.float32)).astype(jnp.int32),
        "invert": jax.random.bernoulli(keys[14], cfg.color_inversion_prob),
        "solarize": jax.random.bernoulli(keys[17], cfg.solarization_prob),
        "posterize": jax.random.bernoulli(keys[18], cfg.posterization_prob),
        "posterize_bits": jax.random.randint(
            keys[19], (), cfg.posterization_bits_range[0],
            cfg.posterization_bits_range[1] + 1,
        ),
        "noise_key": keys[20],
    }


def _gaussian_kernel(sigma: float):
    half = int(sigma * 4)  # reference kernel-size formula (:251-255)
    xs = jnp.arange(-half, half + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (xs / sigma) ** 2)
    return k / k.sum()


def gaussian_blur_clip(frames: jax.Array, sigma: float) -> jax.Array:
    """Separable depthwise blur over [T, H, W, C]; reflect padding."""
    if sigma <= 0:
        return frames
    k1d = _gaussian_kernel(sigma)
    ksize = k1d.shape[0]
    half = ksize // 2
    t, h, w, c = frames.shape
    dn = jax.lax.conv_dimension_numbers(
        (t, h, w, c), (ksize, 1, 1, c), ("NHWC", "HWIO", "NHWC")
    )
    x = jnp.pad(frames, ((0, 0), (half, half), (0, 0), (0, 0)), mode="reflect")
    kh = jnp.tile(k1d.reshape(ksize, 1, 1, 1), (1, 1, 1, c)).astype(frames.dtype)
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c
    )
    x = jnp.pad(x, ((0, 0), (0, 0), (half, half), (0, 0)), mode="reflect")
    kw = jnp.tile(k1d.reshape(1, ksize, 1, 1), (1, 1, 1, c)).astype(frames.dtype)
    dn2 = jax.lax.conv_dimension_numbers(
        x.shape, (1, ksize, 1, c), ("NHWC", "HWIO", "NHWC")
    )
    return jax.lax.conv_general_dilated(
        x, kw, (1, 1), "VALID", dimension_numbers=dn2, feature_group_count=c
    )


def _cutout_mask(h: int, w: int, params: Dict) -> jax.Array:
    """[H, W] multiplicative mask; zero inside active boxes (reference :184-198)."""
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    k_max = params["cutout_top"].shape[0]
    box_ids = jnp.arange(k_max)
    active = params["cutout"] & (box_ids < params["cutout_count"])

    def one_box(top, left, ch, cw, act):
        inside = (
            (ys >= top) & (ys < top + ch) & (xs >= left) & (xs < left + cw)
        )
        return inside & act

    hit = jax.vmap(one_box)(
        params["cutout_top"], params["cutout_left"],
        params["cutout_h"], params["cutout_w"], active,
    ).any(axis=0)
    return jnp.where(hit, 0.0, 1.0)


def augment_clip(frames: jax.Array, params: Dict, cfg: AugmentConfig) -> jax.Array:
    """[T, H, W, C] float [0,1] → augmented; same params across T."""
    t, h, w, c = frames.shape
    x = frames

    # color chain (reference :222-225)
    x = C.adjust_brightness(x, params["brightness"])
    x = C.adjust_contrast(x, params["contrast"])
    x = C.adjust_saturation(x, params["saturation"])
    x = C.adjust_hue(x, params["hue"])

    # affine (reference :229-237); separable matmul warp by default — the
    # gather warp was 41% of the profiled train step (PROFILE_r03.json)
    warp = (affine_warp_clip_separable if cfg.affine_mode == "separable"
            else affine_warp_clip)
    x = warp(
        x, params["rotation"], params["translate"], params["scale"],
        params["shear"],
    )

    # grayscale (reference :241)
    x = jnp.where(params["grayscale"], C.rgb_to_grayscale(x), x)

    # noise — unconditional when configured, fresh per frame (reference :245-246)
    if cfg.noise_level > 0:
        noise = jax.random.normal(params["noise_key"], x.shape) * cfg.noise_level
        x = jnp.clip(x + noise, 0.0, 1.0)

    # blur — unconditional when configured, static kernel (reference :251-255)
    if cfg.blur_sigma > 0:
        x = gaussian_blur_clip(x, cfg.blur_sigma)

    # extreme effects (reference :259-268)
    if cfg.posterization_prob > 0:
        x = jnp.where(params["posterize"],
                      C.posterize(x, params["posterize_bits"]), x)
    if cfg.solarization_prob > 0:
        x = jnp.where(params["solarize"],
                      C.solarize(x, cfg.solarization_threshold), x)
    if cfg.color_inversion_prob > 0:
        x = jnp.where(params["invert"], C.invert(x), x)

    # cutout (reference :144-169, 184-198)
    if cfg.cutout_prob > 0:
        x = x * _cutout_mask(h, w, params)[None, :, :, None]

    # per-clip skip gate (reference :112-114)
    return jnp.where(params["skip"], frames, x)


def augment_batch(key: jax.Array, frames: jax.Array, cfg: AugmentConfig) -> jax.Array:
    """[B, T, H, W, C] float [0,1] → augmented, one key per clip."""
    b, t, h, w, c = frames.shape
    keys = jax.random.split(key, b)
    params = jax.vmap(lambda k: sample_clip_params(k, cfg, h, w))(keys)
    return jax.vmap(lambda f, p: augment_clip(f, p, cfg))(frames, params)
