"""Preview export + attention visualization tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_collision_detection_tpu.models import VideoClassifierModel
from vision_collision_detection_tpu.obs.viz import (
    denormalize_frames,
    export_batch_preview,
    extract_attention_weights,
    plot_attention_heatmap,
    render_attention_overlay,
)


def test_denormalize_roundtrip():
    u8 = (np.random.default_rng(0).random((2, 4, 4, 3)) * 255).astype(np.uint8)
    x = (u8.astype(np.float32) / 255.0 - 0.45) / 0.225
    back = denormalize_frames(x, (0.45,) * 3, (0.225,) * 3)
    assert np.abs(back.astype(int) - u8.astype(int)).max() <= 1


def test_export_batch_preview(tmp_path):
    batch = {
        "frames": (np.random.default_rng(1).random((3, 6, 32, 32, 3)) * 255
                   ).astype(np.uint8),
        "id": ["a", "b", "c"],
        "target": np.array([0, 1, 2]),
    }
    html = export_batch_preview(batch, str(tmp_path), fps=5, max_clips=2)
    assert os.path.exists(html)
    content = open(html).read()
    assert content.count("data:video/mp4;base64") == 2
    assert len([f for f in os.listdir(tmp_path) if f.endswith(".mp4")]) == 2


@pytest.fixture(scope="module")
def attention_model():
    model = VideoClassifierModel(
        backbone="resnet18", temporal_mode="attention", num_classes=3,
        dtype=jnp.float32, attention_heads=4,
    )
    x = jnp.ones((2, 5, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    return model, variables, x


def test_extract_attention_weights(attention_model):
    model, variables, x = attention_model
    logits, per_frame = extract_attention_weights(model, variables, x)
    assert logits.shape == (2, 3)
    assert per_frame.shape == (2, 5)
    np.testing.assert_allclose(per_frame.sum(axis=1) * 5, 5.0, rtol=1e-3)

    _, full = extract_attention_weights(model, variables, x, per_frame=False)
    assert full.shape == (2, 4, 5, 5)  # [B, H, T, T]
    np.testing.assert_allclose(full.sum(-1), 1.0, atol=1e-4)


def test_attention_artifacts(attention_model, tmp_path):
    model, variables, x = attention_model
    _, full = extract_attention_weights(model, variables, x, per_frame=False)
    png = plot_attention_heatmap(full, str(tmp_path / "attn.png"))
    assert os.path.exists(png)

    frames = (np.asarray(x[0]) * 255).astype(np.uint8)
    mp4 = render_attention_overlay(
        frames, full[0].mean(axis=(0, 1)), str(tmp_path / "overlay.mp4"),
        fps=5,
    )
    assert os.path.exists(mp4) and os.path.getsize(mp4) > 0


def test_non_attention_model_raises():
    model = VideoClassifierModel(
        backbone="resnet18", temporal_mode="pooling", dtype=jnp.float32,
    )
    x = jnp.ones((1, 4, 32, 32, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    with pytest.raises(ValueError):
        extract_attention_weights(model, variables, x)


class TestResultCards:
    RESULTS = [
        {"id": "clip_a", "video_path": "/x/clip_a.mp4", "success": True,
         "predicted_class": "Collision", "confidence": 0.8,
         "probabilities": {"Normal": 0.1, "Near Collision": 0.1,
                           "Collision": 0.8}},
        {"id": "clip_b", "success": False, "error": "decode failed"},
    ]

    def test_render_result_card(self):
        from vision_collision_detection_tpu.obs.viz import render_result_card

        fig = render_result_card(self.RESULTS[0])
        # 2 patches per class bar (track + fill)
        assert len(fig.axes[0].patches) == 6
        texts = [t.get_text() for t in fig.axes[0].texts]
        assert any("Predicted: Collision" in t for t in texts)
        assert any("80.0%" in t for t in texts)

    def test_render_error_card(self):
        from vision_collision_detection_tpu.obs.viz import render_result_card

        fig = render_result_card(self.RESULTS[1])
        texts = [t.get_text() for t in fig.axes[0].texts]
        assert any("decode failed" in t for t in texts)

    def test_browse_results_fallback(self):
        """Without ipywidgets installed the browser degrades to one card
        per result."""
        from vision_collision_detection_tpu.obs import viz

        out = viz.browse_results(self.RESULTS)
        if isinstance(out, list):  # fallback path (no ipywidgets here)
            assert len(out) == 2
