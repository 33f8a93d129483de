"""Preprocessing/augmentation op tests (CPU, tiny shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_collision_detection_tpu.config import AugmentConfig
from vision_collision_detection_tpu.ops import (
    augment_batch,
    letterbox_geometry,
    letterbox_resize,
    make_eval_preprocess,
    make_train_preprocess,
    normalize_video,
)
from vision_collision_detection_tpu.ops import color as C
from vision_collision_detection_tpu.ops.affine import affine_warp_clip
from vision_collision_detection_tpu.ops.augment import (
    gaussian_blur_clip,
    sample_clip_params,
)


class TestLetterbox:
    def test_geometry_matches_reference_arithmetic(self):
        # 720p → 224: scale = 224/1280; int(720*0.175) == 125 in IEEE double —
        # the reference's exact float+int-floor behavior, reproduced on purpose.
        assert letterbox_geometry(720, 1280, 224) == (125, 224, 49, 0)
        # 1080p → 224: int-floor scale
        nh, nw, ph, pw = letterbox_geometry(1080, 1920, 224)
        assert (nh, nw) == (int(1080 * 224 / 1920), 224)
        assert ph == (224 - nh) // 2 and pw == 0
        # portrait (same float-floor effect on the width)
        assert letterbox_geometry(1280, 720, 224) == (224, 125, 0, 49)

    def test_resize_shape_and_black_bars(self):
        x = jnp.ones((2, 3, 72, 128, 3), jnp.float32)
        out = letterbox_resize(x, 32)
        assert out.shape == (2, 3, 32, 32, 3)
        out = np.asarray(out)
        nh, nw, ph, pw = letterbox_geometry(72, 128, 32)
        assert np.all(out[..., :ph, :, :] == 0)  # top bar black
        assert np.all(out[..., ph + nh:, :, :] == 0)  # bottom bar black
        content = out[..., ph:ph + nh, :, :]
        np.testing.assert_allclose(content, 1.0, atol=1e-5)

    def test_noop_when_already_target(self):
        x = jnp.arange(2 * 8 * 8 * 3, dtype=jnp.float32).reshape(2, 8, 8, 3)
        assert letterbox_resize(x, 8) is x


class TestColor:
    def setup_method(self):
        self.x = jax.random.uniform(jax.random.PRNGKey(0), (4, 6, 3))

    def test_identity_factors(self):
        np.testing.assert_allclose(C.adjust_brightness(self.x, 1.0), self.x, atol=1e-6)
        np.testing.assert_allclose(C.adjust_contrast(self.x, 1.0), self.x, atol=1e-6)
        np.testing.assert_allclose(C.adjust_saturation(self.x, 1.0), self.x, atol=1e-6)
        np.testing.assert_allclose(C.adjust_hue(self.x, 0.0), self.x, atol=1e-5)

    def test_brightness_scales_and_clips(self):
        np.testing.assert_allclose(
            C.adjust_brightness(self.x, 0.5), np.asarray(self.x) * 0.5, atol=1e-6
        )
        assert float(jnp.max(C.adjust_brightness(self.x, 10.0))) <= 1.0

    def test_saturation_zero_is_grayscale(self):
        g = C.adjust_saturation(self.x, 0.0)
        np.testing.assert_allclose(g[..., 0], g[..., 1], atol=1e-6)
        np.testing.assert_allclose(g[..., 1], g[..., 2], atol=1e-6)

    def test_hsv_roundtrip(self):
        hsv = C.rgb_to_hsv(self.x)
        back = C.hsv_to_rgb(hsv)
        np.testing.assert_allclose(back, self.x, atol=1e-5)

    def test_hue_full_cycle_identity(self):
        shifted = C.adjust_hue(C.adjust_hue(self.x, 0.3), -0.3)
        np.testing.assert_allclose(shifted, self.x, atol=1e-5)

    def test_solarize_posterize_invert(self):
        x = jnp.array([[[0.1, 0.6, 0.9]]])
        np.testing.assert_allclose(
            C.solarize(x, 0.5), [[[0.1, 0.4, 0.1]]], atol=1e-6
        )
        np.testing.assert_allclose(C.invert(x), [[[0.9, 0.4, 0.1]]], atol=1e-6)
        # posterize to 1 bit: bytes 25→0, 153→128, 229→128
        np.testing.assert_allclose(
            C.posterize(x, 1), [[[0.0, 128 / 255, 128 / 255]]], atol=1e-6
        )

    def test_grayscale_weights(self):
        r = jnp.zeros((2, 2, 3)).at[..., 0].set(1.0)
        np.testing.assert_allclose(C.rgb_to_grayscale(r), 0.2989, atol=1e-6)


class TestAffine:
    def test_identity(self):
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 9, 9, 3))
        out = affine_warp_clip(x, 0.0, jnp.zeros(2), 1.0, 0.0)
        np.testing.assert_allclose(out, x, atol=1e-5)

    def test_integer_translation_shifts(self):
        x = np.zeros((1, 8, 8, 1), np.float32)
        x[0, 2, 3, 0] = 1.0
        out = affine_warp_clip(jnp.asarray(x), 0.0, jnp.array([2.0, 1.0]), 1.0, 0.0)
        out = np.asarray(out)
        assert out[0, 3, 5, 0] == pytest.approx(1.0, abs=1e-5)  # +1 row, +2 cols

    def test_rotation_180(self):
        x = jax.random.uniform(jax.random.PRNGKey(2), (1, 7, 7, 1))
        out = affine_warp_clip(x, 180.0, jnp.zeros(2), 1.0, 0.0)
        np.testing.assert_allclose(
            np.asarray(out)[0], np.asarray(x)[0, ::-1, ::-1], atol=1e-4
        )

    def test_separable_identity_exact(self):
        from vision_collision_detection_tpu.ops.affine import (
            affine_warp_clip_separable,
        )

        x = jax.random.uniform(jax.random.PRNGKey(3), (2, 16, 12, 3))
        out = affine_warp_clip_separable(x, 0.0, jnp.zeros(2), 1.0, 0.0)
        np.testing.assert_allclose(out, x, atol=5e-3)  # bf16 operand quantum

    def test_separable_matches_gather_axis_aligned(self):
        """Scale+translate (no rotation/shear): the two-pass decomposition
        is mathematically identical to the direct 2-D bilinear warp."""
        from vision_collision_detection_tpu.ops.affine import (
            affine_warp_clip_separable,
        )

        x = jax.random.uniform(jax.random.PRNGKey(4), (1, 20, 24, 3))
        args = (0.0, jnp.array([1.7, -2.3]), 1.08, 0.0)
        ref = affine_warp_clip(x, *args)
        out = affine_warp_clip_separable(x, *args)
        np.testing.assert_allclose(out, ref, atol=2e-2)  # bf16 quantization

    def test_separable_close_to_gather_on_rotation(self):
        """Rotation/shear: the two-pass filter samples along the slanted
        line — small differences on smooth content, same geometry."""
        from vision_collision_detection_tpu.ops.affine import (
            affine_warp_clip_separable,
        )

        h = w = 32
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        smooth = np.exp(-(((yy - 15) / 9) ** 2 + ((xx - 17) / 9) ** 2))
        x = jnp.asarray(np.tile(smooth[None, :, :, None], (2, 1, 1, 3)))
        args = (8.0, jnp.array([1.0, -1.0]), 1.05, 2.0)
        ref = np.asarray(affine_warp_clip(x, *args))
        out = np.asarray(affine_warp_clip_separable(x, *args))
        assert np.abs(out - ref).max() < 0.02
        assert np.abs(out - ref).mean() < 2e-3

    def test_matches_scipy(self):
        from scipy.ndimage import affine_transform as sp_affine

        h = w = 11
        x = np.random.default_rng(0).random((1, h, w, 1)).astype(np.float32)
        angle, scale = 17.0, 1.08
        out = np.asarray(
            affine_warp_clip(jnp.asarray(x), angle, jnp.zeros(2), scale, 0.0)
        )[0, :, :, 0]
        # our inverse map in (y, x) order: src = M @ (o - c) + c with
        # M = [[cos, -sin], [sin, cos]] / scale  (shear 0, translate 0)
        rot = np.deg2rad(angle)
        m = np.array([[np.cos(rot), -np.sin(rot)],
                      [np.sin(rot), np.cos(rot)]]) / scale
        c = np.array([(h - 1) / 2, (w - 1) / 2])
        expected = sp_affine(
            x[0, :, :, 0], m, offset=c - m @ c,
            order=1, mode="constant", cval=0.0,
        )
        interior = (slice(2, -2), slice(2, -2))  # edges differ on OOB policy
        np.testing.assert_allclose(out[interior], expected[interior], atol=1e-4)


class TestBlurAndAugment:
    def test_blur_preserves_mean_and_smooths(self):
        x = jax.random.uniform(jax.random.PRNGKey(3), (2, 16, 16, 3))
        out = gaussian_blur_clip(x, 1.0)
        assert out.shape == x.shape
        assert float(jnp.mean(out)) == pytest.approx(float(jnp.mean(x)), abs=1e-2)
        assert float(jnp.var(out)) < float(jnp.var(x))

    def test_augment_deterministic_and_per_clip(self):
        cfg = AugmentConfig(noise_level=0.0, blur_sigma=0.0, aug_probability=1.0)
        x = jax.random.uniform(jax.random.PRNGKey(4), (3, 2, 16, 16, 3))
        key = jax.random.PRNGKey(7)
        a1 = augment_batch(key, x, cfg)
        a2 = augment_batch(key, x, cfg)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        # different clips get different params
        d01 = float(jnp.mean(jnp.abs(a1[0] - a1[1])))
        assert d01 > 0

    def test_temporal_consistency(self):
        """A static clip stays static after augmentation (same params ∀ T)."""
        cfg = AugmentConfig(noise_level=0.0, blur_sigma=0.0, aug_probability=1.0,
                            cutout_prob=1.0)
        frame = jax.random.uniform(jax.random.PRNGKey(5), (1, 1, 16, 16, 3))
        clip = jnp.tile(frame, (1, 4, 1, 1, 1))
        out = augment_batch(jax.random.PRNGKey(8), clip, cfg)
        for t in range(1, 4):
            np.testing.assert_allclose(
                np.asarray(out[0, t]), np.asarray(out[0, 0]), atol=1e-6
            )

    def test_skip_gate(self):
        cfg = AugmentConfig(aug_probability=0.0, noise_level=0.0, blur_sigma=0.0)
        x = jax.random.uniform(jax.random.PRNGKey(6), (2, 3, 8, 8, 3))
        out = augment_batch(jax.random.PRNGKey(9), x, cfg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


class TestPreprocess:
    def test_eval_preprocess(self):
        cfg = AugmentConfig()
        fn = make_eval_preprocess(cfg, 32, out_dtype=jnp.float32)
        u8 = (np.random.default_rng(0).random((2, 3, 24, 40, 3)) * 255).astype(np.uint8)
        out = fn(jnp.asarray(u8))
        assert out.shape == (2, 3, 32, 32, 3)
        # black letterbox bars normalize to -mean/std = -2
        nh, nw, ph, pw = letterbox_geometry(24, 40, 32)
        np.testing.assert_allclose(
            np.asarray(out[..., :ph, :, :]), -0.45 / 0.225, atol=1e-5
        )

    def test_train_preprocess_shapes_and_determinism(self):
        cfg = AugmentConfig(noise_level=0.01, blur_sigma=0.5)
        fn = make_train_preprocess(cfg, 32, out_dtype=jnp.float32)
        u8 = (np.random.default_rng(1).random((2, 3, 24, 40, 3)) * 255).astype(np.uint8)
        k = jax.random.PRNGKey(0)
        o1, o2 = fn(k, jnp.asarray(u8)), fn(k, jnp.asarray(u8))
        assert o1.shape == (2, 3, 32, 32, 3)
        np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    def test_normalize(self):
        x = jnp.full((1, 1, 2, 2, 3), 0.45)
        out = normalize_video(x, (0.45,) * 3, (0.225,) * 3)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


class TestAugmentRNGIndependence:
    def test_gate_draws_decorrelate_at_equal_probs(self):
        """Every sampled decision gets its own key (reference samples each
        parameter independently, /root/reference/nexar_video_aug.py:97-182):
        with all gate probs at 0.5, no two gates may be (anti)correlated."""
        import itertools

        cfg = AugmentConfig(
            grayscale_prob=0.5, cutout_prob=0.5, color_inversion_prob=0.5,
            solarization_prob=0.5, posterization_prob=0.5,
        )
        n = 512
        keys = jax.random.split(jax.random.PRNGKey(123), n)
        params = jax.vmap(lambda k: sample_clip_params(k, cfg, 32, 32))(keys)
        gates = {
            name: np.asarray(params[name], dtype=np.int32)
            for name in ("grayscale", "cutout", "invert", "solarize",
                         "posterize")
        }
        for a, b in itertools.combinations(gates, 2):
            agree = float(np.mean(gates[a] == gates[b]))
            assert 0.35 < agree < 0.65, f"{a} vs {b} agree at {agree:.2f}"
        # count/bits draws must not be slaved to their gates either
        count = np.asarray(params["cutout_count"])
        assert len(np.unique(count[gates["cutout"] == 0])) > 1
        bits = np.asarray(params["posterize_bits"])
        assert len(np.unique(bits[gates["posterize"] == 0])) > 1
