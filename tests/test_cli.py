"""CLI smoke tests (synthetic data, tiny settings, CPU)."""

import json
import os

import pandas as pd
import pytest

from vision_collision_detection_tpu.cli.infer import main as infer_main
from vision_collision_detection_tpu.cli.train import main as train_main


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    save = str(root / "runs")
    rc = train_main([
        "--synthetic", "2", "--save-dir", save,
        "--backbone", "resnet18", "--temporal-mode", "pooling",
        "--fps", "5", "--duration", "1", "--frame-size", "32",
        "--batch-size", "3", "--epochs", "1", "--validation-freq", "0",
        "--no-augment", "--single-device", "--test",
        "--experiment-name", "smoke",
    ])
    assert rc == 0
    return save


def test_train_cli_artifacts(run_dir):
    exp = os.path.join(run_dir, "smoke")
    assert os.path.exists(os.path.join(exp, "training_history.csv"))
    assert os.path.exists(os.path.join(exp, "test_results.json"))
    hist = pd.read_csv(os.path.join(exp, "training_history.csv"))
    assert "val_loss" in hist.columns and len(hist) == 1


def test_infer_cli(run_dir, capsys, tmp_path):
    videos = os.path.join(run_dir, "_synthetic_data", "videos")
    out_json = str(tmp_path / "preds.json")
    out_csv = str(tmp_path / "preds.csv")
    rc = infer_main([
        "--checkpoint", os.path.join(run_dir, "smoke"),
        "--videos", videos, "--output", out_json, "--csv", out_csv,
    ])
    assert rc == 0
    results = json.load(open(out_json))
    assert len(results) == 6
    assert all(r["success"] for r in results)
    df = pd.read_csv(out_csv)
    assert "prob_collision" in df.columns


def test_grid_search_cli(tmp_path, capsys):
    from vision_collision_detection_tpu.cli.grid_search import (
        main as grid_main,
    )

    save = str(tmp_path / "grid_runs")
    rc = grid_main([
        "--synthetic", "2", "--save-dir", save,
        "--backbones", "resnet18",
        "--temporal-modes", "pooling",
        "--learning-rates", "1e-3", "3e-4",
        "--fps", "5", "--duration", "1", "--frame-size", "32",
        "--batch-size", "3", "--epochs", "1", "--validation-freq", "0",
        "--no-augment", "--single-device",
    ])
    assert rc == 0
    last_json_line = [
        l for l in capsys.readouterr().out.strip().splitlines()
        if l.startswith("{")
    ][-1]
    out = json.loads(last_json_line)
    assert "best" in out
    df = pd.read_csv(os.path.join(save, "grid_search_results.csv"))
    assert len(df) == 2
    assert os.path.exists(os.path.join(save, "grid_search.png"))


def test_infer_cli_sliding(run_dir, capsys):
    videos_dir = os.path.join(run_dir, "_synthetic_data", "videos")
    first = os.path.join(videos_dir, sorted(os.listdir(videos_dir))[0])
    rc = infer_main([
        "--checkpoint", os.path.join(run_dir, "smoke"),
        "--videos", first, "--sliding", "--stride-sec", "0.2",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "predicted_class" in out
