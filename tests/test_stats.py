"""Dataset statistics + acceleration plot tests."""

import os

import numpy as np
import pandas as pd

from vision_collision_detection_tpu.data.stats import (
    dataset_statistics,
    plot_class_distribution,
    render_stats_html,
)
from vision_collision_detection_tpu.media.synthetic import generate_dataset
from vision_collision_detection_tpu.obs.plots import plot_acceleration


def test_stats_and_html(tmp_path):
    csv = generate_dataset(
        str(tmp_path / "synth"), clips_per_class=2, num_frames=10, height=48,
        width=64, splits=("train", "val"),
    )
    df = pd.read_csv(csv)
    stats = dataset_statistics(df)
    assert stats["num_clips"] == 6
    assert stats["class_counts"]["Collision"] == 2
    assert stats["split_counts"] == {"train": 3, "val": 3}
    assert stats["sensor_coverage"] == 1.0
    assert stats["resolutions"] == {"64x48": 6}
    assert stats["unreadable_videos"] == 0
    assert stats["duration_sec"]["mean"] > 0

    html_path = render_stats_html(stats, str(tmp_path / "stats.html"))
    assert os.path.exists(html_path)
    assert "class_counts" in open(html_path).read()

    png = plot_class_distribution(df, str(tmp_path / "dist.png"))
    assert os.path.exists(png)


def test_plot_acceleration(tmp_path):
    t = np.arange(0, 5, 0.1)
    df = pd.DataFrame({
        "time_sec": t + 100,
        "accel_x_G": np.sin(t), "accel_y_G": np.zeros_like(t),
        "accel_z_G": np.ones_like(t),
        "accel_total_G": np.sqrt(np.sin(t) ** 2 + 1),
    })
    out = plot_acceleration(df, str(tmp_path / "acc.png"), event_time_sec=2.5)
    assert os.path.exists(out)
