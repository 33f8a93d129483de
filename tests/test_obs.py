"""Observability tests: plots, dashboard, history."""

import os

import numpy as np
import pandas as pd

from vision_collision_detection_tpu.obs.dashboard import (
    TrainingVisualizer,
    _NoOpVisualizer,
    create_distributed_visualizer,
)
from vision_collision_detection_tpu.obs.history import TrainingHistory
from vision_collision_detection_tpu.obs.plots import (
    plot_confusion_matrix,
    plot_grid_search,
    plot_prediction_grid,
    plot_training_curves,
)


def test_history_layout(tmp_path):
    h = TrainingHistory(["Normal", "Near Collision", "Collision"])
    h.append_epoch(
        0, {"loss": 1.0, "accuracy": 0.5},
        {"loss": 0.9, "accuracy": 0.6, "auc": 0.7,
         "precision_normal": 0.5, "recall_collision": 0.4,
         "weighted_f1": 0.55},
        lr=1e-4, epoch_time_sec=12.0,
    )
    df = h.to_dataframe()
    assert {"epoch", "train_loss", "val_loss", "val_auc",
            "val_precision_normal", "val_recall_collision",
            "learning_rate", "epoch_time_sec"} <= set(df.columns)
    p = str(tmp_path / "h.csv")
    h.save_csv(p)
    assert len(pd.read_csv(p)) == 1
    # round-trip through checkpoint meta
    h2 = TrainingHistory.from_list(["a", "b", "c"], h.to_list())
    assert h2.records == h.records


def test_plots(tmp_path):
    df = pd.DataFrame({
        "epoch": [0, 1, 2],
        "train_loss": [1.0, 0.8, 0.6],
        "val_loss": [1.1, 0.9, 0.8],
        "train_accuracy": [0.4, 0.5, 0.6],
        "val_accuracy": [0.35, 0.5, 0.55],
        "val_auc": [0.6, 0.7, 0.75],
        "learning_rate": [1e-4, 9e-5, 8e-5],
    })
    assert os.path.exists(plot_training_curves(df, str(tmp_path / "c.png")))
    cm = [[5, 1, 0], [2, 4, 1], [0, 1, 6]]
    names = ["Normal", "Near Collision", "Collision"]
    assert os.path.exists(
        plot_confusion_matrix(cm, names, str(tmp_path / "cm.png")))
    assert os.path.exists(plot_confusion_matrix(
        cm, names, str(tmp_path / "cmn.png"), normalize=True))
    grid = pd.DataFrame({
        "experiment": ["a_gru", "b_att"],
        "backbone": ["a", "b"],
        "temporal_mode": ["gru", "attention"],
        "best_val_loss": [0.8, 0.7],
    })
    assert os.path.exists(plot_grid_search(grid, str(tmp_path / "g.png")))
    frames = (np.random.default_rng(0).random((2, 4, 32, 32, 3)) * 255
              ).astype(np.uint8)
    results = [
        {"predicted_class": "Normal", "confidence": 0.9,
         "probabilities": {"Normal": 0.9, "Near Collision": 0.07,
                           "Collision": 0.03}},
        {"predicted_class": "Collision", "confidence": 0.6,
         "probabilities": {"Normal": 0.2, "Near Collision": 0.2,
                           "Collision": 0.6}},
    ]
    assert os.path.exists(
        plot_prediction_grid(frames, results, str(tmp_path / "p.png")))


def test_dashboard(tmp_path, capsys):
    viz = TrainingVisualizer(total_epochs=2, steps_per_epoch=20,
                             run_dir=str(tmp_path), console=True)
    viz.start_epoch(0)
    for i in range(1, 21):
        viz.update_train_loss(1.0 / i, i)
    viz.update_val_metrics({"loss": 0.5, "accuracy": 0.7})
    viz.update_full_val_metrics({"loss": 0.45, "accuracy": 0.72})
    viz.mark_epoch(0, {"loss": 0.3, "accuracy": 0.8},
                   {"loss": 0.45, "accuracy": 0.72})
    out = capsys.readouterr().out
    assert "epoch 1/2" in out and "it/s" in out
    html_path = tmp_path / "dashboard.html"
    assert html_path.exists()
    content = html_path.read_text()
    assert "best val loss 0.45" in content or "0.45" in content
    assert viz.best_val_loss == 0.45


def test_distributed_factory_is_real_on_main(tmp_path):
    viz = create_distributed_visualizer(1, 10, str(tmp_path))
    assert isinstance(viz, TrainingVisualizer)  # single-process == main
    noop = _NoOpVisualizer()
    noop.update_train_loss(1.0)  # absorbs anything
    noop.whatever(1, 2, x=3)
