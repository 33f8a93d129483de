"""Preprocessing numerics vs torch golden values.

The reference's eval path is torchvision ``F.resize(..., antialias=True)``
letterboxing + (x-0.45)/0.225 normalization
(/root/reference/nexar_video_aug.py:705-742,793-801) and its augmentations
are torchvision functional color ops (:222-268). torchvision isn't installed
here, so the torch side is ``torch.nn.functional.interpolate`` (the exact op
torchvision's tensor ``F.resize`` dispatches to) and hand-built ops
reproducing torchvision's documented float semantics. These tests pin the
arithmetic the AUC-parity contract depends on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as tF

from vision_collision_detection_tpu.config import AugmentConfig
from vision_collision_detection_tpu.ops import color as C
from vision_collision_detection_tpu.ops.letterbox import (
    letterbox_geometry,
    letterbox_resize,
)
from vision_collision_detection_tpu.ops.preprocess import (
    make_eval_preprocess,
    normalize_video,
)


def _image_content(h, w, seed=0):
    """Structured 'real-ish' content: smooth gradients + hard edges + noise —
    exercises both the antialias filter and edge handling."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack([
        0.5 + 0.5 * np.sin(2 * np.pi * xx / w * 3),
        0.5 + 0.5 * np.cos(2 * np.pi * yy / h * 2),
        (xx / w + yy / h) / 2,
    ], axis=-1)
    base[h // 4: h // 2, w // 8: w // 3] = (0.9, 0.1, 0.2)  # hard-edged box
    base += rng.normal(0, 0.02, base.shape).astype(np.float32)
    return np.clip(base, 0.0, 1.0).astype(np.float32)


def _torch_resize(img_hwc, new_h, new_w):
    """torchvision F.resize(antialias=True) == bilinear antialiased
    interpolate (what /root/reference/nexar_video_aug.py:728 executes)."""
    t = torch.from_numpy(img_hwc).permute(2, 0, 1)[None]
    out = tF.interpolate(t, size=(new_h, new_w), mode="bilinear",
                         align_corners=False, antialias=True)
    return out[0].permute(1, 2, 0).numpy()


class TestLetterboxVsTorch:
    def test_downscale_720p_to_224(self):
        img = _image_content(720, 1280)
        new_h, new_w, pad_h, pad_w = letterbox_geometry(720, 1280, 224)
        ref = _torch_resize(img, new_h, new_w)
        out = np.asarray(letterbox_resize(jnp.asarray(img), 224))
        content = out[pad_h: pad_h + new_h, pad_w: pad_w + new_w]
        assert np.abs(content - ref).max() <= 1e-3
        # the pad bars are exactly black
        np.testing.assert_array_equal(out[:pad_h], 0.0)
        np.testing.assert_array_equal(out[pad_h + new_h:], 0.0)

    def test_upscale_small_to_224(self):
        img = _image_content(100, 160, seed=1)
        new_h, new_w, pad_h, pad_w = letterbox_geometry(100, 160, 224)
        ref = _torch_resize(img, new_h, new_w)
        out = np.asarray(letterbox_resize(jnp.asarray(img), 224))
        content = out[pad_h: pad_h + new_h, pad_w: pad_w + new_w]
        assert np.abs(content - ref).max() <= 1e-3

    def test_geometry_int_floor(self):
        # int-floor arithmetic (/root/reference/nexar_video_aug.py:713-719).
        # NB 720·(224/1280) is 126 in exact math but 125.999… in binary fp —
        # int() floors it to 125, and the reference's identical Python
        # expression produces the same 125. Pinning the fp-exact values.
        assert letterbox_geometry(720, 1280, 224) == (
            int(720 * (224 / 1280)), 224, (224 - int(720 * (224 / 1280))) // 2, 0)
        assert letterbox_geometry(720, 1280, 224) == (125, 224, 49, 0)
        assert letterbox_geometry(1080, 1920, 224) == (126, 224, 49, 0)
        assert letterbox_geometry(480, 640, 224) == (168, 224, 28, 0)


class TestEvalPathVsTorch:
    def test_eval_preprocess_end_to_end_bound(self):
        """uint8 → /255 → letterbox → normalize, torch vs ours, fp32.

        Asserted CI bound for the full eval path in NORMALIZED units
        (std=0.225 amplifies raw-pixel error 4.44×)."""
        rng = np.random.default_rng(2)
        u8 = (np.stack([_image_content(360, 640, seed=s) for s in range(4)])
              * 255).astype(np.uint8)[None]  # [B=1, T=4, H, W, C]
        cfg = AugmentConfig()
        fn = make_eval_preprocess(cfg, 224, out_dtype=jnp.float32)
        ours = np.asarray(fn(jnp.asarray(u8)))

        new_h, new_w, pad_h, pad_w = letterbox_geometry(360, 640, 224)
        x = torch.from_numpy(u8[0]).permute(0, 3, 1, 2).float() / 255.0
        r = tF.interpolate(x, size=(new_h, new_w), mode="bilinear",
                           align_corners=False, antialias=True)
        padded = torch.zeros(4, 3, 224, 224)
        padded[:, :, pad_h: pad_h + new_h, pad_w: pad_w + new_w] = r
        ref = ((padded - 0.45) / 0.225).permute(0, 2, 3, 1).numpy()[None]
        assert np.abs(ours - ref).max() <= 5e-3

    def test_normalize_constants_vs_torch(self):
        x = np.random.default_rng(3).random((2, 3, 8, 8, 3)).astype(np.float32)
        ours = np.asarray(normalize_video(jnp.asarray(x), (0.45,) * 3,
                                          (0.225,) * 3))
        ref = ((torch.from_numpy(x) - 0.45) / 0.225).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)


class TestColorOpsVsTorch:
    """torchvision functional float semantics, hand-built in torch
    (torchvision _blend/rgb_to_grayscale formulas; reference applies these at
    /root/reference/nexar_video_aug.py:222-268)."""

    x = np.clip(_image_content(48, 64, seed=4), 0.0, 1.0)

    @staticmethod
    def _tv_gray(t):  # torchvision rgb_to_grayscale on float CHW
        r, g, b = t.unbind(0)
        return (0.2989 * r + 0.587 * g + 0.114 * b).unsqueeze(0)

    @classmethod
    def _blend(cls, img1, img2, ratio):
        return (ratio * img1 + (1.0 - ratio) * img2).clamp(0, 1.0)

    def _torch_chw(self):
        return torch.from_numpy(self.x).permute(2, 0, 1)

    def test_brightness(self):
        t = self._torch_chw()
        ref = self._blend(t, torch.zeros_like(t), 1.3)
        ours = np.asarray(C.adjust_brightness(jnp.asarray(self.x), 1.3))
        np.testing.assert_allclose(
            ours, ref.permute(1, 2, 0).numpy(), atol=1e-6)

    def test_contrast(self):
        t = self._torch_chw()
        mean = torch.mean(self._tv_gray(t), dim=(-3, -2, -1), keepdim=True)
        ref = self._blend(t, mean, 0.7)
        ours = np.asarray(C.adjust_contrast(jnp.asarray(self.x), 0.7))
        np.testing.assert_allclose(
            ours, ref.permute(1, 2, 0).numpy(), atol=1e-5)

    def test_saturation(self):
        t = self._torch_chw()
        ref = self._blend(t, self._tv_gray(t).expand_as(t), 1.4)
        ours = np.asarray(C.adjust_saturation(jnp.asarray(self.x), 1.4))
        np.testing.assert_allclose(
            ours, ref.permute(1, 2, 0).numpy(), atol=1e-5)

    def test_grayscale(self):
        t = self._torch_chw()
        ref = self._tv_gray(t).expand_as(t)
        ours = np.asarray(C.rgb_to_grayscale(jnp.asarray(self.x)))
        np.testing.assert_allclose(
            ours, ref.permute(1, 2, 0).numpy(), atol=1e-5)

    def test_hue(self):
        """torchvision adjust_hue: RGB→HSV, h += shift mod 1, HSV→RGB."""
        t = self._torch_chw()
        ref = _torch_adjust_hue(t, 0.1)
        ours = np.asarray(C.adjust_hue(jnp.asarray(self.x), 0.1))
        np.testing.assert_allclose(
            ours, ref.permute(1, 2, 0).numpy(), atol=1e-4)

    def test_solarize(self):
        t = self._torch_chw()
        ref = torch.where(t >= 0.5, 1.0 - t, t)
        ours = np.asarray(C.solarize(jnp.asarray(self.x), 0.5))
        np.testing.assert_allclose(
            ours, ref.permute(1, 2, 0).numpy(), atol=1e-6)

    def test_posterize_byte_domain(self):
        t = (self._torch_chw() * 255).to(torch.uint8)
        bits = 3
        mask = -int(2 ** (8 - bits))  # torchvision posterize: img & mask
        ref = (t & mask).float() / 255.0
        ours = np.asarray(C.posterize(jnp.asarray(self.x), bits))
        np.testing.assert_allclose(
            ours, ref.permute(1, 2, 0).numpy(), atol=1e-6)

    def test_invert(self):
        ours = np.asarray(C.invert(jnp.asarray(self.x)))
        np.testing.assert_allclose(ours, 1.0 - self.x, atol=1e-6)


def _torch_adjust_hue(img, hue_factor):
    """torchvision _functional_tensor.adjust_hue for float CHW, verbatim
    semantics (rgb→hsv, shift h, hsv→rgb)."""
    r, g, b = img.unbind(0)
    maxc = torch.max(img, dim=0).values
    minc = torch.min(img, dim=0).values
    eqc = maxc == minc
    cr = maxc - minc
    ones = torch.ones_like(maxc)
    s = cr / torch.where(eqc, ones, maxc)
    cr_divisor = torch.where(eqc, ones, cr)
    rc = (maxc - r) / cr_divisor
    gc = (maxc - g) / cr_divisor
    bc = (maxc - b) / cr_divisor
    hr = (maxc == r) * (bc - gc)
    hg = ((maxc == g) & (maxc != r)) * (2.0 + rc - bc)
    hb = ((maxc != g) & (maxc != r)) * (4.0 + gc - rc)
    h = hr + hg + hb
    h = torch.fmod((h / 6.0 + 1.0), 1.0)

    h = (h + hue_factor) % 1.0
    # hsv → rgb
    i = torch.floor(h * 6.0)
    f = (h * 6.0) - i
    i = i.to(torch.int32)
    p = torch.clamp((maxc * (1.0 - s)), 0.0, 1.0)
    q = torch.clamp((maxc * (1.0 - s * f)), 0.0, 1.0)
    t_ = torch.clamp((maxc * (1.0 - s * (1.0 - f))), 0.0, 1.0)
    i = i % 6
    mask = i.unsqueeze(0) == torch.arange(6, dtype=i.dtype).view(-1, 1, 1)
    a1 = torch.stack((maxc, q, p, p, t_, maxc), dim=0)
    a2 = torch.stack((t_, maxc, maxc, q, p, p), dim=0)
    a3 = torch.stack((p, p, t_, maxc, maxc, q), dim=0)
    a4 = torch.stack((a1, a2, a3), dim=0)
    return torch.einsum("...ijk, ...xijk -> ...xjk", mask.to(img.dtype), a4)
