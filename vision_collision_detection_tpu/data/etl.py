"""Offline label ETL: raw label exports → training metadata CSV.

Python-module equivalent of the reference's ETL notebooks
(load_labels_encord.ipynb cells 7-15, SURVEY.md §2c #21): parse label-export
JSON, merge with video inventories, augment event rows with ±1 s time
jitter (duplicated rows), balance classes, and emit the stratified-split
metadata CSV the datasets consume. The S3-presigned-URL helper
(create_singe_url.ipynb) is gated on boto3, which this framework treats as
an optional dependency.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd

from vision_collision_detection_tpu.data.metadata import (
    add_split_column_to_metadata,
)


def load_label_export(path: str,
                      class_field: str = "classification",
                      id_field: str = "video_id",
                      time_field: str = "event_time_sec") -> pd.DataFrame:
    """Parse a label-export JSON (list of {video_id, classification,
    event_time_sec, ...}) into a normalized DataFrame."""
    with open(path) as f:
        raw = json.load(f)
    if isinstance(raw, dict):
        raw = raw.get("labels", list(raw.values()))
    rows = []
    for item in raw:
        rows.append({
            "id": str(item[id_field]),
            "video_type": item[class_field],
            "event_time_sec": item.get(time_field),
        })
    return pd.DataFrame(rows)


def jitter_event_times(df: pd.DataFrame,
                       jitter_sec: float = 1.0,
                       copies: int = 2,
                       only_classes: Optional[Sequence[str]] = None,
                       time_column: str = "event_time_sec",
                       seed: int = 42) -> pd.DataFrame:
    """Row-duplication time-jitter augmentation (load_labels_encord.ipynb
    cells 7-9): each event row gains `copies` duplicates with the event time
    shifted uniformly within ±jitter_sec (clamped at 0)."""
    rng = np.random.default_rng(seed)
    out = [df]
    eligible = df
    if only_classes is not None:
        eligible = df[df["video_type"].isin(only_classes)]
    eligible = eligible[eligible[time_column].notna()]
    for _ in range(copies):
        dup = eligible.copy()
        dup[time_column] = np.maximum(
            0.0,
            dup[time_column].to_numpy()
            + rng.uniform(-jitter_sec, jitter_sec, len(dup)),
        )
        out.append(dup)
    return pd.concat(out, ignore_index=True)


def balance_classes(df: pd.DataFrame,
                    label_column: str = "video_type",
                    strategy: str = "downsample",
                    seed: int = 42) -> pd.DataFrame:
    """Class balancing via down-sampling the majority classes or
    up-sampling (with replacement) the minorities (notebook cells 10-12)."""
    rng = np.random.default_rng(seed)
    counts = df[label_column].value_counts()
    target = counts.min() if strategy == "downsample" else counts.max()
    parts = []
    for label, n in counts.items():
        sub = df[df[label_column] == label]
        if strategy == "downsample" and n > target:
            parts.append(sub.sample(n=target, random_state=seed))
        elif strategy == "upsample" and n < target:
            extra = sub.sample(n=target - n, replace=True, random_state=seed)
            parts.append(pd.concat([sub, extra]))
        else:
            parts.append(sub)
    return pd.concat(parts).sample(frac=1.0, random_state=seed).reset_index(
        drop=True
    )


def build_training_csv(
    labels_json: str,
    video_root: str,
    out_csv: str,
    *,
    jitter_sec: float = 1.0,
    jitter_copies: int = 2,
    jitter_classes: Sequence[str] = ("Collision", "Near Collision"),
    balance: str = "",
    train_frac: float = 0.70,
    val_frac: float = 0.15,
    seed: int = 42,
) -> str:
    """Full notebook pipeline: labels → resolve paths → jitter → balance →
    stratified split → CSV."""
    df = load_label_export(labels_json)
    resolved = []
    for _, row in df.iterrows():
        for ext in (".mp4", ".mov"):
            p = os.path.join(video_root, row["id"] + ext)
            if os.path.exists(p):
                resolved.append(p)
                break
        else:
            resolved.append("")
    df["video_path"] = resolved
    df = df[df["video_path"] != ""].reset_index(drop=True)

    df = jitter_event_times(
        df, jitter_sec=jitter_sec, copies=jitter_copies,
        only_classes=jitter_classes, seed=seed,
    )
    if balance:
        df = balance_classes(df, strategy=balance, seed=seed)
    df = add_split_column_to_metadata(
        df, train_frac=train_frac, val_frac=val_frac, seed=seed
    )
    os.makedirs(os.path.dirname(out_csv) or ".", exist_ok=True)
    df.to_csv(out_csv, index=False)
    return out_csv


def presigned_urls(video_ids: Sequence[str], bucket: str,
                   prefix: str = "", expires_sec: int = 3600) -> Dict[str, str]:
    """S3 presigned URLs (create_singe_url.ipynb); requires boto3."""
    try:
        import boto3  # type: ignore
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "boto3 is not installed in this environment; presigned_urls is "
            "an optional integration"
        ) from e
    s3 = boto3.client("s3")
    return {
        vid: s3.generate_presigned_url(
            "get_object",
            Params={"Bucket": bucket, "Key": f"{prefix}{vid}.mp4"},
            ExpiresIn=expires_sec,
        )
        for vid in video_ids
    }
