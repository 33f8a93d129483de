"""End-to-end AUC-parity harness: torch reference pipeline vs this framework.

The north star is collision-AUC parity ±0.002 with the reference
(BASELINE.md; AUC oracle /root/reference/nexar_train.py:1496-1506). Real
NVIDIA dashcam data and trained weights are not available in this
environment, so this harness measures the full-pipeline numerical drift on
synthetic labeled clips with a seeded reference-architecture model:

  torch side:  decode → per-frame antialiased resize + normalize (the
               reference's transform loop, nexar_video_aug.py:705-801) →
               ::2 subsample → EnhancedFrameCNN (plain-torch mirror) → probs
  our side:    the SAME checkpoint imported via models/import_torch →
               CollisionPredictor (C++ decode, fused device preprocessing,
               ReferenceVideoClassifier) → probs

Reported: max/mean abs prob diff, prediction agreement, weighted OvR AUC of
both sides against the synthetic labels, and the AUC delta. Because both
sides share weights, every remaining difference is pipeline numerics
(decode, resize filter, normalize, layout) — exactly what the ±0.002 budget
must absorb once real weights exist.

Writes PARITY_r02.json at the repo root; add --checkpoint to run against a
real reference .pth instead of seeded random weights.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def log(m):
    print(m, file=sys.stderr, flush=True)


def torch_pipeline_probs(model, paths, num_frames, frame_size):
    """The reference's eval data path, in torch (cited in module docstring)."""
    import torch
    import torch.nn.functional as tF

    from vision_collision_detection_tpu.media.decoder import decode_frames
    from vision_collision_detection_tpu.ops.letterbox import letterbox_geometry

    probs = []
    model.eval()
    with torch.no_grad():
        for p in paths:
            frames = decode_frames(p, list(range(num_frames)))  # [T,H,W,C] u8
            t = torch.from_numpy(frames).permute(0, 3, 1, 2).float() / 255.0
            nh, nw, ph, pw = letterbox_geometry(
                t.shape[2], t.shape[3], frame_size)
            r = tF.interpolate(t, size=(nh, nw), mode="bilinear",
                               align_corners=False, antialias=True)
            canvas = torch.zeros(num_frames, 3, frame_size, frame_size)
            canvas[:, :, ph:ph + nh, pw:pw + nw] = r
            canvas = (canvas - 0.45) / 0.225
            x = canvas.permute(0, 2, 3, 1)[None]  # [1,T,H,W,C]
            logits = model(x)
            probs.append(torch.softmax(logits, dim=-1)[0].numpy())
    return np.stack(probs)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="",
                    help="real reference .pth (default: seeded random weights)")
    ap.add_argument("--clips-per-class", type=int, default=6)
    ap.add_argument("--frame-size", type=int, default=224)
    ap.add_argument("--fps", type=int, default=10)
    ap.add_argument("--duration", type=int, default=5)
    ap.add_argument("--backbone", default="resnet18",
                    choices=["resnet18", "convnext_tiny"])
    ap.add_argument("--temporal-mode", default="gru")
    ap.add_argument("--workdir", default="/tmp/vcd_parity")
    ap.add_argument("--output", default=os.path.join(REPO, "PARITY_r02.json"))
    args = ap.parse_args()

    import torch

    import jax  # noqa: F401  (platform init before heavy work)

    from test_import_reference import (
        TorchConvNeXtTiny,
        TorchEnhancedFrameCNN,
        TorchResNet18,
        _randomize_running_stats,
    )
    from vision_collision_detection_tpu.infer import CollisionPredictor
    from vision_collision_detection_tpu.media.synthetic import generate_dataset
    from vision_collision_detection_tpu.metrics import classification_metrics

    num_frames = args.fps * args.duration

    # --- synthetic labeled clips (dashcam-ish motion per class) -------------
    import pandas as pd

    csv = generate_dataset(
        os.path.join(args.workdir, "clips"),
        clips_per_class=args.clips_per_class,
        num_frames=num_frames, height=360, width=640, fps=args.fps,
        splits=("test",),
    )
    df = pd.read_csv(csv)
    paths = list(df["video_path"])
    labels = list(df["video_type"])
    name_to_idx = {"Normal": 0, "Near Collision": 1, "Collision": 2}
    y = np.array([name_to_idx[l] for l in labels])
    log(f"{len(paths)} clips")

    # --- reference model (torch) --------------------------------------------
    if args.checkpoint:
        ckpt = torch.load(args.checkpoint, map_location="cpu",
                          weights_only=False)
        hp = ckpt.get("hyperparams", {})
        backbone_name = hp.get("base_model", "convnext_tiny")
        mode = hp.get("temporal_mode", "gru")
        bb = (TorchConvNeXtTiny() if backbone_name == "convnext_tiny"
              else TorchResNet18())
        dim = 768 if backbone_name == "convnext_tiny" else 512
        tmodel = TorchEnhancedFrameCNN(bb, dim, mode,
                                       num_classes=hp.get("num_classes", 3))
        tmodel.load_state_dict(ckpt["model_state_dict"])
        src = args.checkpoint
    else:
        torch.manual_seed(7)
        bb = (TorchConvNeXtTiny() if args.backbone == "convnext_tiny"
              else TorchResNet18())
        dim = 768 if args.backbone == "convnext_tiny" else 512
        tmodel = TorchEnhancedFrameCNN(bb, dim, args.temporal_mode,
                                       num_classes=3)
        _randomize_running_stats(tmodel)
        backbone_name, mode = args.backbone, args.temporal_mode
        src = "seeded-random"
    tmodel.eval()

    # --- torch-side pipeline -------------------------------------------------
    log("torch pipeline ...")
    probs_t = torch_pipeline_probs(tmodel, paths, num_frames, args.frame_size)

    # --- our pipeline via checkpoint import ----------------------------------
    log("importing checkpoint + running our pipeline ...")
    pth = os.path.join(args.workdir, "ref_ckpt.pth")
    torch.save({"model_state_dict": tmodel.state_dict(),
                "hyperparams": {"base_model": backbone_name,
                                "temporal_mode": mode,
                                "num_classes": 3}}, pth)
    pred = CollisionPredictor.from_torch_checkpoint(pth)
    pred.cfg = pred.cfg.override({
        "data.fps": args.fps, "data.duration": args.duration,
        "data.frame_size": args.frame_size, "data.num_workers": 2,
    })
    results = pred.predict(paths, sample_strategy="center", batch_size=4)
    by_path = {r["video_path"]: r for r in results}
    probs_o = np.stack([
        np.array([by_path[p]["probabilities"][c]
                  for c in pred.class_names]) for p in paths
    ])

    # --- comparison -----------------------------------------------------------
    diff = np.abs(probs_t - probs_o)
    m_t = classification_metrics(y, probs_t.argmax(1), probs_t, 3,
                                 tuple(name_to_idx))
    m_o = classification_metrics(y, probs_o.argmax(1), probs_o, 3,
                                 tuple(name_to_idx))
    out = {
        "weights": src,
        "model": f"{backbone_name}+{mode}",
        "n_clips": len(paths),
        "frame_size": args.frame_size,
        "num_frames": num_frames,
        "max_abs_prob_diff": float(diff.max()),
        "mean_abs_prob_diff": float(diff.mean()),
        "prediction_agreement": float(
            (probs_t.argmax(1) == probs_o.argmax(1)).mean()),
        "auc_torch_pipeline": float(m_t.get("auc", float("nan"))),
        "auc_our_pipeline": float(m_o.get("auc", float("nan"))),
    }
    out["auc_delta"] = abs(out["auc_torch_pipeline"] - out["auc_our_pipeline"])
    out["within_auc_budget_0.002"] = bool(out["auc_delta"] <= 0.002)
    with open(args.output, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
