"""Sensor-fusion model option (IMU stream fused into the classifier)."""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from vision_collision_detection_tpu.config import ExperimentConfig
from vision_collision_detection_tpu.models import VideoClassifierModel


def test_sensor_changes_logits():
    model = VideoClassifierModel(
        backbone="resnet18", temporal_mode="pooling", dtype=jnp.float32,
        use_sensor=True, frame_subsample=1, subsample_threshold=100,
    )
    frames = jnp.ones((2, 4, 32, 32, 3))
    sensor = jnp.zeros((2, 4, 4))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, frames, sensor=sensor, train=False
    )
    base = model.apply(variables, frames, sensor=sensor, train=False)
    spike = sensor.at[:, 2, :].set(5.0)
    out = model.apply(variables, frames, sensor=spike, train=False)
    assert not np.allclose(np.asarray(base), np.asarray(out))


def test_use_sensor_requires_input():
    model = VideoClassifierModel(
        backbone="resnet18", temporal_mode="pooling", dtype=jnp.float32,
        use_sensor=True,
    )
    frames = jnp.ones((1, 4, 32, 32, 3))
    with pytest.raises(ValueError):
        model.init({"params": jax.random.PRNGKey(0)}, frames, train=False)


def test_trainer_with_sensor_fusion(tmp_path):
    from vision_collision_detection_tpu.data import (
        create_datasets_with_manual_split,
    )
    from vision_collision_detection_tpu.media.synthetic import generate_dataset
    from vision_collision_detection_tpu.train import Trainer

    csv = generate_dataset(
        str(tmp_path / "synth"), clips_per_class=2, num_frames=8, height=40,
        width=56, splits=("train", "val"),
    )
    df = pd.read_csv(csv).fillna({"sensor_path": ""})
    train, val, _ = create_datasets_with_manual_split(
        df, fps=4, duration=2, frame_size=32, load_sensor=True,
    )
    cfg = ExperimentConfig().override({
        "model.backbone": "resnet18",
        "model.temporal_mode": "pooling",
        "model.dtype": "float32",
        "model.use_sensor": True,
        "model.frame_subsample": 1,
        "data.fps": 4, "data.duration": 2, "data.frame_size": 32,
        "data.load_sensor_data": True,
        "data.batch_size": 3,
        "train.epochs": 1,
        "train.validation_freq": 0,
        "train.log_every_steps": 0,
        "augment.blur_sigma": 0.0,
    })
    tr = Trainer(cfg, train, val, run_dir=str(tmp_path / "run"))
    hist = tr.train()
    assert np.isfinite(hist.to_dataframe()["train_loss"].iloc[-1])
    assert "sensor_fc1" in tr.state.params
