"""Training CLI.

Capability parity with the reference's launcher scripts
(/root/reference/nexar_train_distributed.py:50-110 flag surface,
nexar_complete_with_validation.py:1084-1142), single-controller style: no
torchrun — one process per host, devices discovered from the mesh. The
``uniform`` sampling strategy the reference CLI advertises but never
implemented (nexar_train_distributed.py:63) works here.

Usage:
  python -m vision_collision_detection_tpu.cli.train \
      --metadata-csv data.csv --backbone convnext_tiny --temporal-mode gru \
      --epochs 15 --batch-size 8 [--synthetic N] [--data-parallel] [--test]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU collision-detection training")
    # data
    p.add_argument("--metadata-csv", default="", help="metadata CSV path")
    p.add_argument("--video-dirs", nargs="*", default=[],
                   help="base dirs to scan when CSV has no video_path column")
    p.add_argument("--split-column", default="split")
    p.add_argument("--video-path-column", default="video_path")
    p.add_argument("--label-column", default="video_type")
    p.add_argument("--id-column", default="id")
    p.add_argument("--fps", type=int, default=10)
    p.add_argument("--duration", type=int, default=5)
    p.add_argument("--frame-size", type=int, default=224)
    p.add_argument("--sample-strategy", default="random",
                   choices=["random", "center", "metadata_time", "uniform"])
    p.add_argument("--load-sensor", action="store_true")
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--synthetic", type=int, default=0, metavar="N",
                   help="generate N clips/class of synthetic data (smoke runs)")
    # model
    p.add_argument("--backbone", "--base-model", dest="backbone",
                   default="convnext_tiny")
    p.add_argument("--temporal-mode", default="gru",
                   choices=["attention", "conv", "pooling", "rnn", "lstm", "gru"])
    p.add_argument("--dropout", type=float, default=0.5)
    p.add_argument("--pretrained-path", default="",
                   help="converted torchvision weights (.npz)")
    # optimization
    p.add_argument("--epochs", type=int, default=15)
    p.add_argument("--batch-size", type=int, default=8, help="per device")
    p.add_argument("--learning-rate", "--lr", dest="lr", type=float,
                   default=1e-4)
    p.add_argument("--weight-decay", type=float, default=1e-4)
    p.add_argument("--loss-type", default="cross_entropy",
                   choices=["cross_entropy", "bce"])
    p.add_argument("--no-class-weights", action="store_true")
    p.add_argument("--patience", type=int, default=5)
    p.add_argument("--validation-freq", type=int, default=2)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--no-augment", action="store_true")
    p.add_argument("--dashboard", action="store_true",
                   help="live console+HTML training dashboard "
                        "(the reference's DynamicTrainingVisualizer)")
    # experiment
    p.add_argument("--save-dir", default="runs")
    p.add_argument("--experiment-name", default="")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--test", action="store_true", help="run test() after train")
    # parallel
    p.add_argument("--data-parallel", action="store_true",
                   help="force shard_map DP (auto when >1 device)")
    p.add_argument("--single-device", action="store_true")
    return p


def config_from_args(args) -> "ExperimentConfig":
    from vision_collision_detection_tpu.config import ExperimentConfig

    return ExperimentConfig().override({
        "data.fps": args.fps,
        "data.duration": args.duration,
        "data.frame_size": args.frame_size,
        "data.sample_strategy": args.sample_strategy,
        "data.load_sensor_data": args.load_sensor,
        "data.batch_size": args.batch_size,
        "data.num_workers": args.num_workers,
        "data.seed": args.seed,
        "model.backbone": args.backbone,
        "model.temporal_mode": args.temporal_mode,
        "model.dropout": args.dropout,
        "model.pretrained_path": args.pretrained_path,
        "optim.learning_rate": args.lr,
        "optim.weight_decay": args.weight_decay,
        "optim.loss_type": args.loss_type,
        "optim.use_class_weights": not args.no_class_weights,
        "train.epochs": args.epochs,
        "train.patience": args.patience,
        "train.validation_freq": args.validation_freq,
        "train.seed": args.seed,
        "train.resume": args.resume,
        "train.dashboard": args.dashboard,
        "augment.enabled": not args.no_augment,
        "experiment_name": args.experiment_name,
        "save_dir": args.save_dir,
        "metadata_csv": args.metadata_csv,
    })


def load_datasets(args, cfg):
    import pandas as pd

    from vision_collision_detection_tpu.data import (
        create_datasets_from_directories,
        create_datasets_with_manual_split,
    )

    if args.synthetic:
        from vision_collision_detection_tpu.media.synthetic import generate_dataset

        out = os.path.join(cfg.save_dir, "_synthetic_data")
        # split order guarantees val/test coverage even at 3 clips/class
        csv = generate_dataset(
            out, clips_per_class=args.synthetic, num_frames=cfg.data.num_frames,
            fps=cfg.data.fps, splits=("train", "val", "test", "train", "train"),
        )
        df = pd.read_csv(csv).fillna({"sensor_path": ""})
        return create_datasets_with_manual_split(
            df, fps=cfg.data.fps, duration=cfg.data.duration,
            frame_size=cfg.data.frame_size,
            train_strategy=cfg.data.sample_strategy,
            load_sensor=cfg.data.load_sensor_data, seed=cfg.data.seed,
        )

    if not args.metadata_csv:
        raise SystemExit("--metadata-csv (or --synthetic N) is required")
    df = pd.read_csv(args.metadata_csv)
    common = dict(
        fps=cfg.data.fps, duration=cfg.data.duration,
        frame_size=cfg.data.frame_size,
        train_strategy=cfg.data.sample_strategy,
        load_sensor=cfg.data.load_sensor_data, seed=cfg.data.seed,
    )
    if args.video_dirs:
        return create_datasets_from_directories(
            df, args.video_dirs, id_column=args.id_column,
            label_column=args.label_column, **common,
        )
    return create_datasets_with_manual_split(
        df, split_column=args.split_column,
        video_path_column=args.video_path_column,
        label_column=args.label_column, id_column=args.id_column,
        **common,
    )


def pick_strategy(args):
    import jax

    from vision_collision_detection_tpu.parallel import (
        DataParallelStrategy,
        maybe_initialize_distributed,
    )
    from vision_collision_detection_tpu.train import SingleDeviceStrategy

    maybe_initialize_distributed()
    if args.single_device:
        return SingleDeviceStrategy()
    if args.data_parallel or jax.device_count() > 1:
        # VCD_NUM_DATA (set by scripts/run_training.sh distributed [N])
        # clamps the data-parallel width to the first N devices.
        n = int(os.environ.get("VCD_NUM_DATA", "0") or 0)
        if 0 < n < jax.device_count():
            from vision_collision_detection_tpu.config import MeshConfig
            from vision_collision_detection_tpu.parallel import create_mesh

            mesh = create_mesh(
                MeshConfig(num_data=n, num_model=1), jax.devices()[:n]
            )
            return DataParallelStrategy(mesh)
        return DataParallelStrategy()
    return SingleDeviceStrategy()


def main(argv=None) -> int:
    from vision_collision_detection_tpu.cli import enable_compile_cache

    enable_compile_cache()
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)
    strategy = pick_strategy(args)
    train_ds, val_ds, test_ds = load_datasets(args, cfg)

    from vision_collision_detection_tpu.train import Trainer

    trainer = Trainer(cfg, train_ds, val_ds, test_ds, strategy=strategy)
    trainer.train()
    if args.test:
        metrics = trainer.test()
        printable = {k: v for k, v in metrics.items()
                     if not k.startswith("_") and k != "ids"}
        print(json.dumps(printable, indent=2, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
