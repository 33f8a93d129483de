"""Inference API tests: checkpoint reconstruction, predict paths/dir, sliding."""

import os

import numpy as np
import pandas as pd
import pytest

from vision_collision_detection_tpu.config import ExperimentConfig
from vision_collision_detection_tpu.data import create_datasets_with_manual_split
from vision_collision_detection_tpu.infer import CollisionPredictor
from vision_collision_detection_tpu.media.synthetic import generate_dataset
from vision_collision_detection_tpu.train import Trainer


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    root = tmp_path_factory.mktemp("infer")
    csv = generate_dataset(
        str(root / "synth"), clips_per_class=3, num_frames=12, height=40,
        width=56, splits=("train", "train", "val"),
    )
    df = pd.read_csv(csv).fillna({"sensor_path": ""})
    cfg = ExperimentConfig().override({
        "model.backbone": "resnet18",
        "model.temporal_mode": "pooling",
        "model.dtype": "float32",
        "data.fps": 5,
        "data.duration": 1,
        "data.frame_size": 32,
        "data.batch_size": 4,
        "train.epochs": 1,
        "train.validation_freq": 0,
        "train.log_every_steps": 0,
        "augment.blur_sigma": 0.0,
    })
    train, val, test = create_datasets_with_manual_split(
        df, fps=5, duration=1, frame_size=32,
    )
    run_dir = str(root / "run")
    tr = Trainer(cfg, train, val, run_dir=run_dir)
    tr.train()
    return run_dir, df


def test_from_checkpoint_reconstructs_architecture(trained_run):
    run_dir, _ = trained_run
    pred = CollisionPredictor.from_checkpoint(run_dir)
    assert pred.cfg.model.backbone == "resnet18"
    assert pred.class_names == ("Normal", "Near Collision", "Collision")


def test_predict_list_and_directory(trained_run):
    run_dir, df = trained_run
    pred = CollisionPredictor.from_checkpoint(run_dir)
    paths = df["video_path"].tolist()[:4]
    res = pred.predict(paths, batch_size=2)
    assert len(res) == 4
    for r in res:
        assert r["success"]
        assert r["predicted_class"] in pred.class_names
        assert abs(sum(r["probabilities"].values()) - 1.0) < 1e-4
    # directory walk
    video_dir = os.path.dirname(paths[0])
    res_dir = pred.predict(video_dir)
    assert len(res_dir) == 9  # all synthetic clips

    text = CollisionPredictor.display_results(res[:1])
    assert "%" in text


def test_predict_handles_bad_file(trained_run, tmp_path):
    run_dir, df = trained_run
    pred = CollisionPredictor.from_checkpoint(run_dir)
    bad = str(tmp_path / "broken.mp4")
    with open(bad, "wb") as f:
        f.write(b"not a video")
    res = pred.predict([df["video_path"].iloc[0], bad])
    assert res[0]["success"] and not res[1]["success"]


def test_evaluate_against_ground_truth(trained_run, tmp_path):
    """Notebook-parity eval (inference.ipynb cells 14-17)."""
    run_dir, df = trained_run
    pred = CollisionPredictor.from_checkpoint(run_dir)
    cm_path = str(tmp_path / "cm.png")
    metrics = pred.evaluate(df, confusion_matrix_path=cm_path)
    assert 0.0 <= metrics["accuracy"] <= 1.0
    assert metrics["num_samples"] == len(df)
    assert metrics["num_failed"] == 0
    assert "auc" in metrics and "f1_collision" in metrics
    assert os.path.exists(cm_path)


def test_sliding_window(trained_run):
    run_dir, df = trained_run
    pred = CollisionPredictor.from_checkpoint(run_dir)
    # 12-frame video @10fps, 1s (10-frame) window, 0.2s stride → starts 0,2
    res = pred.predict_sliding(df["video_path"].iloc[0], stride_sec=0.2)
    assert len(res) >= 2
    assert res[0]["start_sec"] == 0.0
    assert res[1]["start_sec"] > res[0]["start_sec"]
    for r in res:
        assert abs(sum(r["probabilities"].values()) - 1.0) < 1e-4


# ---------------------------------------------------------------- AOT bundle
def test_export_serving_bundle_roundtrip(trained_run, tmp_path):
    """export_serving → ServingBundle: the deserialized StableHLO program
    reproduces the live jitted forward exactly, with bucket padding and
    chunking across buckets (infer/aot.py)."""
    import json

    from vision_collision_detection_tpu.infer import ServingBundle
    from vision_collision_detection_tpu.infer.aot import _forward_shape

    run_dir, _ = trained_run
    pred = CollisionPredictor.from_checkpoint(run_dir)
    bundle_dir = str(tmp_path / "bundle")
    manifest = pred.export_serving(bundle_dir, batch_sizes=(1, 2))
    (T, H, W, C), stride = _forward_shape(pred.cfg, None)
    assert manifest["frame_shape"] == [T, H, W, C]
    assert manifest["buckets"] == [1, 2]
    assert manifest["platforms"] == ["cpu"]
    assert manifest["class_names"] == list(pred.class_names)

    bundle = ServingBundle(bundle_dir)
    rng = np.random.default_rng(0)
    frames = (rng.random((3, T, H, W, C)) * 255).astype(np.uint8)
    probs = bundle.predict_probs(frames)  # 3 clips → chunk of 2 + padded 1
    assert probs.shape == (3, len(pred.class_names))
    live = np.asarray(pred._make_forward(stride > 1)(frames))
    np.testing.assert_allclose(probs, live, atol=1e-6)

    results = bundle.predict(frames[:1])
    assert results[0]["predicted_class"] in bundle.class_names
    assert abs(sum(results[0]["probabilities"].values()) - 1.0) < 1e-4

    with pytest.raises(ValueError):
        bundle.predict_probs(frames[:, :, : H - 2])  # wrong per-clip shape

    # platform guard: a bundle exported for another backend refuses to load
    mpath = os.path.join(bundle_dir, "manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    m["platforms"] = ["tpu"]
    with open(mpath, "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError):
        ServingBundle(bundle_dir)
