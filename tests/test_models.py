"""Model shape/behavior tests (tiny shapes, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision_collision_detection_tpu.config import ModelConfig
from vision_collision_detection_tpu.models import (
    VideoClassifierModel,
    build_model,
    canonicalize_video_layout,
)
from vision_collision_detection_tpu.models.backbones import (
    build_backbone,
    feature_dim,
)

B, T, H, W = 2, 12, 32, 32


def _init_and_apply(model, x, train=False):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, train=False)
    out = model.apply(
        variables, x, train=train,
        rngs={"dropout": jax.random.PRNGKey(2)} if train else None,
        mutable=["batch_stats"] if train else False,
    )
    if train:
        out = out[0]
    return variables, out


@pytest.mark.parametrize("name", ["resnet18", "convnext_tiny", "mobilenet_v2",
                                  "mobilenet_v3_small", "efficientnet_v2_s"])
def test_backbone_shapes(name):
    net = build_backbone(name, dtype=jnp.float32)
    x = jnp.zeros((3, 64, 64, 3))
    _, feats = _init_and_apply(net, x)
    assert feats.shape == (3, feature_dim(name))
    assert feats.dtype == jnp.float32


@pytest.mark.parametrize("mode", ["attention", "conv", "pooling", "gru", "lstm", "rnn"])
def test_temporal_modes(mode):
    model = VideoClassifierModel(
        backbone="resnet18", temporal_mode=mode, num_classes=3,
        dtype=jnp.float32,
    )
    x = jnp.ones((B, T, H, W, 3), jnp.float32)
    _, logits = _init_and_apply(model, x)
    assert logits.shape == (B, 3)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_layout_autodetect():
    x_tfirst = jnp.arange(B * T * H * W * 3, dtype=jnp.float32).reshape(B, T, H, W, 3)
    x_cfirst = jnp.transpose(x_tfirst, (0, 4, 1, 2, 3))
    np.testing.assert_array_equal(
        canonicalize_video_layout(x_cfirst), x_tfirst
    )
    # already-canonical input is untouched
    np.testing.assert_array_equal(canonicalize_video_layout(x_tfirst), x_tfirst)


def test_frame_subsample_matches_manual():
    """T=12 > threshold 10 → model sees frames ::2 (reference nexar_arch.py:412-415)."""
    model = VideoClassifierModel(
        backbone="resnet18", temporal_mode="pooling", dtype=jnp.float32,
        frame_subsample=2, subsample_threshold=10,
    )
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 12, H, W, 3))
    variables, logits_full = _init_and_apply(model, x)
    # manually pre-subsampled input through a no-subsample model must agree
    model2 = VideoClassifierModel(
        backbone="resnet18", temporal_mode="pooling", dtype=jnp.float32,
        frame_subsample=1, subsample_threshold=100,
    )
    logits_manual = model2.apply(variables, x[:, ::2], train=False)
    np.testing.assert_allclose(
        np.asarray(logits_full), np.asarray(logits_manual), rtol=1e-5, atol=1e-5
    )


def test_build_model_from_config_and_vivit():
    cfg = ModelConfig(backbone="vivit_small", num_classes=3, dtype="float32",
                      patch_size=8)
    model = build_model(cfg)
    x = jnp.zeros((1, 4, 16, 16, 3))
    _, logits = _init_and_apply(model, x)
    assert logits.shape == (1, 3)


def test_train_mode_runs_with_dropout_and_batchstats():
    model = VideoClassifierModel(backbone="resnet18", temporal_mode="conv",
                                 dtype=jnp.float32)
    x = jnp.ones((B, 4, H, W, 3))
    _, logits = _init_and_apply(model, x, train=True)
    assert logits.shape == (B, 3)


def test_hoisted_gru_equals_flax_rnn():
    """The hoisted-scan GRU (input projections batched outside the scan)
    must match nn.RNN(nn.GRUCell) exactly on shared params — same tree,
    same seeded init, same outputs."""
    import flax.linen as nn

    from vision_collision_detection_tpu.models.temporal import TemporalRNN

    class OldGRU(nn.Module):
        hidden: int = 8

        @nn.compact
        def __call__(self, x):
            fw = nn.RNN(nn.GRUCell(features=self.hidden, dtype=jnp.float32,
                                   name="fw_cell"), name="fw")(x)
            bw = nn.RNN(nn.GRUCell(features=self.hidden, dtype=jnp.float32,
                                   name="bw_cell"), reverse=True,
                        keep_order=True, name="bw")(x)
            last = jnp.concatenate([fw[:, -1], bw[:, 0]], -1)
            return nn.relu(nn.Dense(self.hidden, name="proj")(last))

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((3, 7, 12)), jnp.float32)
    old = OldGRU()
    v_old = old.init(jax.random.PRNGKey(5), x)
    new = TemporalRNN(dim=12, hidden=8, cell_type="gru")
    v_new = new.init(jax.random.PRNGKey(5), x)
    for a, b in zip(jax.tree.leaves(v_old), jax.tree.leaves(v_new)):
        np.testing.assert_array_equal(a, b)  # same seeded init
    y_old = old.apply(v_old, x)
    y_new = new.apply(v_old, x)  # old params through the hoisted path
    np.testing.assert_allclose(y_old, y_new, atol=1e-6)
