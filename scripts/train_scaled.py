"""On-chip learning evidence for the scaled ViViT config.

Round-3 review: SCALED_r03.json proved the vivit_small 32f@336 config is
FAST (B=2 no-remat, 72.6 ms/step) but nothing showed it LEARNS. This
script runs a short real training at that recommended config on separable
synthetic data and appends a ``trained`` section (loss curve, val/test AUC)
to the scaled artifact.

Run on the chip:  python scripts/train_scaled.py
Writes SCALED_r04.json (sweep rows carried over from SCALED_r03.json).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(m):
    print(m, file=sys.stderr, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips-per-class", type=int, default=8)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--frame-size", type=int, default=336)
    ap.add_argument("--num-frames", type=int, default=32)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--workdir", default="/tmp/vcd_scaled_train")
    ap.add_argument("--output", default=os.path.join(REPO, "SCALED_r04.json"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".bench_cache", "xla"))

    import pandas as pd

    from vision_collision_detection_tpu.config import ExperimentConfig
    from vision_collision_detection_tpu.data import (
        create_datasets_with_manual_split,
    )
    from vision_collision_detection_tpu.media.synthetic import generate_dataset
    from vision_collision_detection_tpu.train import Trainer

    fps = 8
    duration = args.num_frames // fps
    csv = generate_dataset(
        os.path.join(args.workdir, "clips"),
        clips_per_class=args.clips_per_class,
        num_frames=args.num_frames, height=360, width=640, fps=fps,
        splits=("train",) * 6 + ("val", "test"),
    )
    df = pd.read_csv(csv).fillna({"sensor_path": ""})
    train, val, test = create_datasets_with_manual_split(
        df, fps=fps, duration=duration, frame_size=args.frame_size,
    )
    log(f"{len(train)} train / {len(val)} val / {len(test)} test clips")

    cfg = ExperimentConfig().override({
        "model.backbone": "vivit_small",
        "model.dtype": "bfloat16",
        "model.dropout": 0.0,
        "model.remat": False,  # the recommended B=2 config (SCALED_r03)
        "data.fps": fps, "data.duration": duration,
        "data.frame_size": args.frame_size,
        "data.batch_size": args.batch_size,
        "optim.learning_rate": args.lr,
        "train.epochs": args.epochs,
        "train.patience": args.epochs,
        "train.validation_freq": 0,
        "train.log_every_steps": 0,
        "augment.enabled": False,
        "augment.horizontal_flip_prob": 0.0,
        "augment.blur_sigma": 0.0,
    })
    tr = Trainer(cfg, train, val, test,
                 run_dir=os.path.join(args.workdir, "run"))
    hist = tr.train()
    hdf = hist.to_dataframe()
    res = tr.test()
    log(f"final train loss {hdf['train_loss'].iloc[-1]:.4f}, "
        f"acc {hdf['train_accuracy'].iloc[-1]:.3f}; "
        f"test: {json.dumps({k: v for k, v in res.items() if not k.startswith('_')}, default=str)[:300]}")

    trained = {
        "config": {
            "backbone": "vivit_small", "frames": args.num_frames,
            "size": args.frame_size, "batch": args.batch_size,
            "remat": False, "dtype": "bfloat16", "lr": args.lr,
            "epochs": args.epochs,
            "clips": {"train": len(train), "val": len(val),
                      "test": len(test)},
        },
        "train_loss_curve": [round(float(v), 4) for v in hdf["train_loss"]],
        "train_accuracy_curve": [round(float(v), 4)
                                 for v in hdf["train_accuracy"]],
        "test_loss": round(float(res["loss"]), 4),
        "test_accuracy": round(float(res["accuracy"]), 4),
        "test_auc": round(float(res.get("auc", float("nan"))), 4),
        "loss_decreased": bool(hdf["train_loss"].iloc[-1]
                               < hdf["train_loss"].iloc[0]),
        "device_kind": jax.devices()[0].device_kind,
    }

    out = {}
    r03 = os.path.join(REPO, "SCALED_r03.json")
    if os.path.exists(r03):
        with open(r03) as f:
            out = json.load(f)
    out["trained"] = trained
    with open(args.output, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(trained, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
