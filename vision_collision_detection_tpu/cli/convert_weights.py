"""Offline weight-conversion CLI: torchvision .pth → flax .npz.

The reference relies on torchvision ImageNet weights
(/root/reference/nexar_arch.py:289-341, pretrained=True). Run this once
per backbone on a machine with the .pth file, then point
``--pretrained-path`` (cli.train) or ``ModelConfig.pretrained_path`` at the
.npz.

Usage:
  python -m vision_collision_detection_tpu.cli.convert_weights \
      --torch-checkpoint convnext_tiny-983f1562.pth \
      --backbone convnext_tiny --output convnext_tiny_imagenet.npz
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description="torchvision → flax weights")
    p.add_argument("--torch-checkpoint", required=True)
    p.add_argument("--backbone", required=True)
    p.add_argument("--output", required=True)
    args = p.parse_args(argv)

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
