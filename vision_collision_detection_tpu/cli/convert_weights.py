"""Offline weight-conversion CLI: torch .pth → flax .npz.

Two modes:

1. Backbone (default): a torchvision ImageNet ``state_dict``
   (/root/reference/nexar_arch.py:289-341, pretrained=True) → backbone .npz
   for ``--pretrained-path`` (cli.train) / ``ModelConfig.pretrained_path``.

     python -m vision_collision_detection_tpu.cli.convert_weights \
         --torch-checkpoint convnext_tiny-983f1562.pth \
         --backbone convnext_tiny --output convnext_tiny_imagenet.npz

2. ``--full``: a complete reference TRAINING checkpoint
   (``model_state_dict`` + ``hyperparams``, the contract consumed by
   /root/reference/nexar_inference.py:33-101) → full-model .npz plus a
   ``.npz.hyperparams.json`` sidecar, loadable torch-free with
   ``CollisionPredictor.from_torch_checkpoint``.

     python -m vision_collision_detection_tpu.cli.convert_weights \
         --torch-checkpoint best_model.pth --full --output model.npz

Run this once on any machine with the .pth file (torch only; no GPU, no
torchvision needed) — the training/inference hosts then never import torch.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="torch → flax weights")
    p.add_argument("--torch-checkpoint", required=True)
    p.add_argument("--backbone",
                   help="torchvision backbone name (backbone mode)")
    p.add_argument("--full", action="store_true",
                   help="convert a full reference training checkpoint "
                        "(backbone + temporal head + classifier)")
    p.add_argument("--output", required=True)
    args = p.parse_args(argv)

    if args.full:
        from vision_collision_detection_tpu.models.import_torch import (
            import_checkpoint_file,
        )

        hp, _ = import_checkpoint_file(args.torch_checkpoint, args.output)
        print(f"wrote {args.output} + {args.output}.hyperparams.json "
              f"({hp['base_model']} + {hp['temporal_mode']}, "
              f"{hp['num_classes']} classes)")
        return 0

    if not args.backbone:
        p.error("--backbone is required unless --full is given")
    from vision_collision_detection_tpu.models.convert import (
        convert_checkpoint_file,
    )

    out = convert_checkpoint_file(
        args.torch_checkpoint, args.backbone, args.output
    )
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
