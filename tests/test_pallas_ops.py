"""Pallas kernel parity tests (interpreter mode on CPU vs the XLA path)."""

import jax.numpy as jnp
import numpy as np
import pytest

from vision_collision_detection_tpu.config import AugmentConfig
from vision_collision_detection_tpu.ops.letterbox import letterbox_resize
from vision_collision_detection_tpu.ops.pallas_ops import (
    fused_dequant_normalize_pad,
)
from vision_collision_detection_tpu.ops.preprocess import (
    eval_preprocess,
    normalize_video,
)

MEAN = (0.45, 0.45, 0.45)
STD = (0.225, 0.225, 0.225)


def _xla_reference(u8, S):
    x = jnp.asarray(u8, jnp.float32) / 255.0
    x = letterbox_resize(x, S)
    return np.asarray(normalize_video(x, MEAN, STD))


@pytest.mark.parametrize("content", [(18, 32), (32, 18), (32, 32)])
def test_fused_kernel_matches_xla(content):
    ch, cw = content
    u8 = (np.random.default_rng(0).random((2, 3, ch, cw, 3)) * 255).astype(
        np.uint8
    )
    ref = _xla_reference(u8, 32)
    out = np.asarray(
        fused_dequant_normalize_pad(
            jnp.asarray(u8), 32, MEAN, STD, out_dtype=jnp.float32,
            interpret=True,
        )
    )
    assert out.shape == ref.shape == (2, 3, 32, 32, 3)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_per_channel_normalization():
    """Distinct per-channel mean/std exercise the iota%3 pattern row."""
    u8 = np.full((1, 1, 4, 32, 3), 128, np.uint8)
    u8[..., 1] = 64
    mean = (0.5, 0.25, 0.1)
    std = (0.5, 0.25, 0.2)
    out = np.asarray(
        fused_dequant_normalize_pad(
            jnp.asarray(u8), 32, mean, std, out_dtype=jnp.float32,
            interpret=True,
        )
    )
    content = out[0, 0, 14:18]  # pad_h = (32-4)//2
    np.testing.assert_allclose(
        content[..., 0], (128 / 255 - 0.5) / 0.5, atol=1e-5
    )
    np.testing.assert_allclose(
        content[..., 1], (64 / 255 - 0.25) / 0.25, atol=1e-5
    )
    # bars carry the normalized-zero value per channel
    np.testing.assert_allclose(out[0, 0, 0, 0, 2], -0.1 / 0.2, atol=1e-5)


def test_eval_preprocess_pallas_auto_on_cpu_falls_back():
    """On CPU, auto mode uses XLA; force mode uses the interpreted kernel;
    both agree."""
    cfg = AugmentConfig()
    u8 = (np.random.default_rng(1).random((1, 2, 18, 32, 3)) * 255).astype(
        np.uint8
    )
    xla = np.asarray(
        eval_preprocess(jnp.asarray(u8), cfg, 32, jnp.float32,
                        use_pallas="never")
    )
    forced = np.asarray(
        eval_preprocess(jnp.asarray(u8), cfg, 32, jnp.float32,
                        use_pallas="force")
    )
    np.testing.assert_allclose(xla, forced, atol=1e-5)


def test_rejects_oversized_content():
    with pytest.raises(ValueError):
        fused_dequant_normalize_pad(
            jnp.zeros((1, 40, 32, 3), jnp.uint8), 32, MEAN, STD,
            interpret=True,
        )
