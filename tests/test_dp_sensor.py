"""DP strategy with sensor fusion enabled."""

import jax
import numpy as np

from vision_collision_detection_tpu.config import ExperimentConfig
from vision_collision_detection_tpu.parallel import DataParallelStrategy
from vision_collision_detection_tpu.train import create_train_state


def test_dp_with_sensor_fusion():
    cfg = ExperimentConfig().override({
        "model.backbone": "resnet18",
        "model.temporal_mode": "pooling",
        "model.dtype": "float32",
        "model.use_sensor": True,
        "model.frame_subsample": 1,
        "data.fps": 4, "data.duration": 1, "data.frame_size": 32,
        "data.load_sensor_data": True,
        "augment.enabled": False,
        "augment.horizontal_flip_prob": 0.0,
        "augment.blur_sigma": 0.0,
    })
    dp = DataParallelStrategy()
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), 10)
    train_step, eval_step = dp.make_steps(model, cfg, None)

    rng = np.random.default_rng(0)
    frames = (rng.random((8, 4, 32, 32, 3)) * 255).astype(np.uint8)
    sensor = rng.normal(size=(8, 4, 4)).astype(np.float32)
    targets = (np.arange(8) % 3).astype(np.int64)
    mask = np.ones(8, np.float32)
    sh = dp.data_sharding

    state2, m = train_step(
        state,
        jax.device_put(frames, sh), jax.device_put(targets, sh),
        jax.device_put(mask, sh), jax.random.PRNGKey(1),
        jax.device_put(sensor, sh),
    )
    assert np.isfinite(float(m["loss"]))
    out = eval_step(
        state2,
        jax.device_put(frames, sh), jax.device_put(targets, sh),
        jax.device_put(mask, sh), jax.device_put(sensor, sh),
    )
    probs = dp.to_host(out["probs"])
    np.testing.assert_allclose(probs.sum(1), 1.0, atol=1e-5)
