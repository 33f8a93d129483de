"""Build the committed pretrained-weights fixture.

Real torchvision ImageNet weights are unobtainable in this environment
(no torchvision package, no ~/.cache/torch checkpoints, zero egress — see
PARITY.md "Known gaps"), so this script produces the closest committable
artifact: a REAL-FORMAT torchvision state_dict (exact key universe and
shapes from the vendored manifest, seeded values with sensible
distributions) saved as .pth, pushed through the production converter
(`cli.convert_weights --backbone mobilenet_v3_small`), and re-stored
fp16 for size (~5 MB). Output:

    tests/fixtures/pretrained/mobilenet_v3_small_seeded_fp16.npz

tests/test_pretrained_fixture.py consumes it through the same
`ModelConfig.pretrained_path` path a user with real converted weights
would use (reference behavior being mirrored:
/root/reference/nexar_arch.py:289-341, pretrained=True + head swap).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BACKBONE = "mobilenet_v3_small"
OUT = os.path.join(REPO, "tests", "fixtures", "pretrained",
                   f"{BACKBONE}_seeded_fp16.npz")


def build_state_dict():
    import torch

    manifest = json.load(open(os.path.join(
        REPO, "vision_collision_detection_tpu", "models", "manifests",
        f"{BACKBONE}.json")))
    rng = np.random.default_rng(1234)
    sd = {}
    for key, shape in manifest["keys"].items():
        shape = tuple(shape)
        if key.endswith("num_batches_tracked"):
            sd[key] = torch.tensor(1000, dtype=torch.int64)
        elif key.endswith("running_mean"):
            sd[key] = torch.zeros(shape)
        elif key.endswith("running_var"):
            sd[key] = torch.ones(shape)
        elif key.endswith(".bias") or ".1.bias" in key:
            sd[key] = torch.zeros(shape)
        elif len(shape) == 1:  # bn/ln scale
            sd[key] = torch.ones(shape)
        else:  # conv / linear weights: kaiming-ish fan-in scaling
            fan_in = int(np.prod(shape[1:])) or 1
            sd[key] = torch.from_numpy(
                (rng.standard_normal(shape) * (2.0 / fan_in) ** 0.5)
                .astype(np.float32))
    return sd


def main() -> int:
    import torch

    from vision_collision_detection_tpu.cli.convert_weights import main as cw

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pth = "/tmp/fixture_backbone.pth"
    torch.save(build_state_dict(), pth)
    f32 = "/tmp/fixture_backbone_f32.npz"
    rc = cw(["--torch-checkpoint", pth, "--backbone", BACKBONE,
             "--output", f32])
    if rc:
        return rc
    # fp16 on disk: halves the committed size; train/steps.py casts back
    # to the init dtype on load
    src = np.load(f32)
    out = {k: (v.astype(np.float16) if v.dtype == np.float32 else v)
           for k, v in src.items()}
    np.savez_compressed(OUT, **out)
    print(f"wrote {OUT} ({os.path.getsize(OUT) / 1e6:.1f} MB, "
          f"{len(out)} arrays)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
