"""Learning sanity: the framework actually fits the synthetic signal, and
training survives corrupt clips (zero-fallback + loss masking)."""

import numpy as np
import pandas as pd
import pytest

from vision_collision_detection_tpu.config import ExperimentConfig
from vision_collision_detection_tpu.data import (
    ClipRecord,
    create_datasets_with_manual_split,
)
from vision_collision_detection_tpu.media.synthetic import generate_dataset
from vision_collision_detection_tpu.train import Trainer


@pytest.fixture(scope="module")
def datasets(tmp_path_factory):
    root = tmp_path_factory.mktemp("learn")
    csv = generate_dataset(
        str(root), clips_per_class=8, num_frames=10, height=48, width=64,
        splits=("train",) * 6 + ("val", "test"),
    )
    df = pd.read_csv(csv).fillna({"sensor_path": ""})
    return create_datasets_with_manual_split(
        df, fps=5, duration=2, frame_size=32,
    )


def test_model_learns_synthetic_signal(datasets, tmp_path):
    train, val, test = datasets
    cfg = ExperimentConfig().override({
        "model.backbone": "resnet18",
        "model.temporal_mode": "pooling",
        "model.dtype": "float32",
        "model.dropout": 0.1,
        "data.fps": 5, "data.duration": 2, "data.frame_size": 32,
        "data.batch_size": 6,
        "data.num_workers": 4,
        "optim.learning_rate": 3e-4,
        "train.epochs": 6,
        "train.patience": 6,
        "train.validation_freq": 0,
        "train.log_every_steps": 0,
        "augment.enabled": False,
        "augment.horizontal_flip_prob": 0.0,
        "augment.blur_sigma": 0.0,
    })
    tr = Trainer(cfg, train, val, run_dir=str(tmp_path / "run"))
    hist = tr.train()
    df = hist.to_dataframe()
    # train accuracy well above chance (1/3) by the end
    assert df["train_accuracy"].iloc[-1] > 0.6, df["train_accuracy"].tolist()
    # loss decreased
    assert df["train_loss"].iloc[-1] < df["train_loss"].iloc[0]


@pytest.mark.slow
def test_vivit_learns_synthetic_signal(datasets, tmp_path):
    """The scaled flagship (vivit_small — real dims, tiny input) must FIT,
    not just step: round-3 review flagged that the ViViT had perf evidence
    but no learning evidence."""
    train, val, test = datasets
    cfg = ExperimentConfig().override({
        "model.backbone": "vivit_small",
        "model.patch_size": 8,
        "model.dtype": "float32",
        "model.dropout": 0.0,
        "data.fps": 5, "data.duration": 2, "data.frame_size": 32,
        "data.batch_size": 6,
        "data.num_workers": 4,
        "optim.learning_rate": 1e-4,
        "train.epochs": 8,
        "train.patience": 8,
        "train.validation_freq": 0,
        "train.log_every_steps": 0,
        "augment.enabled": False,
        "augment.horizontal_flip_prob": 0.0,
        "augment.blur_sigma": 0.0,
    })
    tr = Trainer(cfg, train, val, run_dir=str(tmp_path / "run_vivit"))
    hist = tr.train()
    df = hist.to_dataframe()
    assert df["train_accuracy"].iloc[-1] > 0.6, df["train_accuracy"].tolist()
    assert df["train_loss"].iloc[-1] < df["train_loss"].iloc[0]


def test_training_survives_corrupt_clips(datasets, tmp_path):
    train, val, _ = datasets
    # inject broken records into a copy of the train set
    import copy

    train2 = copy.copy(train)
    train2.records = list(train.records) + [
        ClipRecord("broken1", "/nonexistent_a.mp4", 0),
        ClipRecord("broken2", "/nonexistent_b.mp4", 2),
    ]
    cfg = ExperimentConfig().override({
        "model.backbone": "resnet18",
        "model.temporal_mode": "pooling",
        "model.dtype": "float32",
        "data.fps": 5, "data.duration": 2, "data.frame_size": 32,
        "data.batch_size": 5,
        "train.epochs": 1,
        "train.validation_freq": 0,
        "train.log_every_steps": 0,
        "augment.blur_sigma": 0.0,
    })
    tr = Trainer(cfg, train2, val, run_dir=str(tmp_path / "run2"))
    hist = tr.train()
    assert np.isfinite(hist.to_dataframe()["train_loss"].iloc[-1])
