"""The committed pretrained-backbone artifact drives the real
`pretrained_path` pathway end-to-end.

Real torchvision ImageNet weights cannot be fetched in this environment
(PARITY.md "Known gaps"); the committed fixture is a REAL-FORMAT seeded
torchvision state_dict converted by the production converter
(scripts/make_pretrained_fixture.py) and stored fp16. This test pins the
full user path for offline-supplied weights: npz → load_pretrained_backbone
(fp16→f32 cast) → fine-tune steps from it (reference behavior:
/root/reference/nexar_arch.py:289-341 pretrained=True + head swap).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from vision_collision_detection_tpu.config import ExperimentConfig

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "pretrained",
                       "mobilenet_v3_small_seeded_fp16.npz")


def _cfg():
    cfg = ExperimentConfig()
    return cfg.override({
        "model.backbone": "mobilenet_v3_small",
        "model.temporal_mode": "pooling",
        "model.pretrained_path": FIXTURE,
        "data.fps": 2,
        "data.duration": 2,
        "data.frame_size": 64,
    })


def test_fixture_loads_and_finetunes():
    from vision_collision_detection_tpu.train.steps import (
        create_train_state,
        make_train_step,
    )

    cfg = _cfg()
    model, state = create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=2,
        sample_frames_shape=(1, 4, 64, 64, 3),
    )

    # loaded values come from the npz (cast fp16 → f32, not re-initialized):
    z = np.load(FIXTURE)
    key = "params/stem_conv/kernel"
    assert key in z.files
    got = np.asarray(
        state.params["backbone"]["stem_conv"]["kernel"], np.float32)
    np.testing.assert_allclose(got, z[key].astype(np.float32), rtol=0, atol=0)
    assert got.dtype == np.float32  # cast back to init dtype, not fp16

    # short fine-tune from the converted weights: loss finite and params move
    step = make_train_step(model, cfg, None, donate=False)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (2, 4, 64, 64, 3), np.uint8)
    targets = np.array([0, 2], np.int64)
    mask = np.ones((2,), np.float32)
    before = got.copy()
    for i in range(2):
        state, metrics = step(state, jnp.asarray(frames), targets, mask,
                              jax.random.PRNGKey(i))
    assert np.isfinite(float(metrics["loss"]))
    after = np.asarray(
        state.params["backbone"]["stem_conv"]["kernel"], np.float32)
    assert np.abs(after - before).max() > 0
