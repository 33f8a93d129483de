"""Training history with the reference's flat per-class CSV layout.

Mirrors the 13-key flat history dict and ``training_history.csv``
(/root/reference/nexar_complete_with_validation.py:540-555,938-946) plus the
per-epoch validation JSON artifacts (/root/reference/nexar_train.py:
1520-1540).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np
import pandas as pd


class TrainingHistory:
    def __init__(self, class_names):
        self.class_names = [
            str(c).lower().replace(" ", "_") for c in class_names
        ]
        self.records: List[Dict] = []

    def append_epoch(self, epoch: int, train_metrics: Dict,
                     val_metrics: Optional[Dict] = None,
                     lr: Optional[float] = None,
                     epoch_time_sec: Optional[float] = None) -> None:
        row: Dict = {"epoch": epoch}
        for k, v in train_metrics.items():
            row[f"train_{k}"] = _scalar(v)
        if val_metrics:
            for k in ("loss", "accuracy", "auc", "weighted_precision",
                      "weighted_recall", "weighted_f1"):
                if k in val_metrics:
                    row[f"val_{k}"] = _scalar(val_metrics[k])
            for cname in self.class_names:
                for m in ("precision", "recall", "f1"):
                    key = f"{m}_{cname}"
                    if key in val_metrics:
                        row[f"val_{key}"] = _scalar(val_metrics[key])
        if lr is not None:
            row["learning_rate"] = float(lr)
        if epoch_time_sec is not None:
            row["epoch_time_sec"] = float(epoch_time_sec)
        self.records.append(row)

    def to_dataframe(self) -> pd.DataFrame:
        return pd.DataFrame(self.records)

    def save_csv(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.to_dataframe().to_csv(path, index=False)

    def to_list(self) -> List[Dict]:
        return list(self.records)

    @classmethod
    def from_list(cls, class_names, records) -> "TrainingHistory":
        h = cls(class_names)
        h.records = [dict(r) for r in records]
        return h


def save_metrics_json(path: str, metrics: Dict) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump({k: _scalar(v) if np.isscalar(v) or isinstance(
            v, (np.generic, float, int)) else v for k, v in metrics.items()},
            f, indent=2, default=str)


def save_predictions_csv(path: str, ids, targets, preds, probs,
                         class_names) -> None:
    """Per-clip predictions with per-class probabilities
    (/root/reference/nexar_train.py:1742-1778)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    df = pd.DataFrame({
        "id": ids,
        "target": np.asarray(targets),
        "predicted": np.asarray(preds),
    })
    probs = np.asarray(probs)
    for i, name in enumerate(class_names):
        df[f"prob_{str(name).lower().replace(' ', '_')}"] = probs[:, i]
    df["correct"] = df["target"] == df["predicted"]
    df.to_csv(path, index=False)


def _scalar(v):
    if isinstance(v, (np.generic,)):
        return v.item()
    if hasattr(v, "item") and getattr(v, "size", 2) == 1:
        return float(v.item())
    return v
