"""Label ETL tests."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from vision_collision_detection_tpu.data.etl import (
    balance_classes,
    build_training_csv,
    jitter_event_times,
    load_label_export,
)


@pytest.fixture
def labels_json(tmp_path):
    labels = [
        {"video_id": f"clip{i}", "classification": cls,
         "event_time_sec": 2.0 + i * 0.1}
        for i, cls in enumerate(
            ["Normal"] * 6 + ["Near Collision"] * 3 + ["Collision"] * 3
        )
    ]
    p = str(tmp_path / "labels.json")
    json.dump(labels, open(p, "w"))
    return p


def test_load_label_export(labels_json):
    df = load_label_export(labels_json)
    assert len(df) == 12
    assert set(df.columns) == {"id", "video_type", "event_time_sec"}


def test_jitter_duplicates_rows(labels_json):
    df = load_label_export(labels_json)
    out = jitter_event_times(df, jitter_sec=1.0, copies=2,
                             only_classes=("Collision",))
    # 12 original + 2 copies × 3 collision rows
    assert len(out) == 18
    col = out[out["video_type"] == "Collision"]
    base_times = df[df["video_type"] == "Collision"]["event_time_sec"]
    assert col["event_time_sec"].nunique() > base_times.nunique()
    assert (col["event_time_sec"] >= 0).all()


def test_balance(labels_json):
    df = load_label_export(labels_json)
    down = balance_classes(df, strategy="downsample")
    assert down["video_type"].value_counts().nunique() == 1
    assert down["video_type"].value_counts().iloc[0] == 3
    up = balance_classes(df, strategy="upsample")
    assert up["video_type"].value_counts().iloc[0] == 6


def test_build_training_csv(labels_json, tmp_path):
    video_root = tmp_path / "videos"
    video_root.mkdir()
    for i in range(12):
        (video_root / f"clip{i}.mp4").write_bytes(b"x")  # existence only
    out = build_training_csv(
        labels_json, str(video_root), str(tmp_path / "meta.csv"),
        jitter_copies=1, balance="",
    )
    df = pd.read_csv(out)
    assert {"id", "video_type", "event_time_sec", "video_path",
            "split"} <= set(df.columns)
    assert set(df["split"]) <= {"train", "val", "test"}
    assert len(df) == 12 + 6  # 6 jittered near-collision/collision rows
