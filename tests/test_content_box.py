"""Content-box transfer: bit-exactness vs the square path + mixed-aspect guard.

The content-box optimization ships only letterbox content rows and pads the
black bars on-device. AUC parity requires that this produces EXACTLY the
square-decode result (the reference's letterbox arithmetic,
/root/reference/nexar_video_aug.py:713-719) — and that heterogeneous-aspect
datasets fall back to square decode instead of silently double-letterboxing
(VERDICT r1 #8).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vision_collision_detection_tpu.config import AugmentConfig
from vision_collision_detection_tpu.data.datasets import ClipDataset, ClipRecord
from vision_collision_detection_tpu.media.decoder import encode_video
from vision_collision_detection_tpu.ops.letterbox import letterbox_geometry
from vision_collision_detection_tpu.ops.preprocess import make_eval_preprocess


@pytest.fixture(scope="module")
def video_120x160(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cb") / "clip.mp4")
    rng = np.random.default_rng(3)
    frames = (rng.random((8, 120, 160, 3)) * 255).astype(np.uint8)
    encode_video(path, frames, fps=4.0)
    return path


def _dataset(path, content_box):
    recs = [ClipRecord("clip", path, 0)]
    return ClipDataset(recs, fps=4, duration=1, frame_size=64,
                       sample_strategy="center", content_box=content_box)


def test_content_box_eval_bit_identical(video_120x160):
    """eval output from content-row shipping == square decode, exactly."""
    S = 64
    nh, nw, _, _ = letterbox_geometry(120, 160, S)  # 48x64, scale 0.4
    box = (nh + nh % 2, nw)

    sq = _dataset(video_120x160, None).get(0, epoch=0)
    cb = _dataset(video_120x160, box).get(0, epoch=0)
    assert sq["frames"].shape[-3:-1] == (S, S)
    assert cb["frames"].shape[-3:-1] == box

    cfg = AugmentConfig()
    fn = make_eval_preprocess(cfg, S, out_dtype=jnp.float32)
    out_sq = np.asarray(fn(jnp.asarray(sq["frames"][None])))
    out_cb = np.asarray(fn(jnp.asarray(cb["frames"][None])))
    np.testing.assert_array_equal(out_sq, out_cb)


def test_content_box_odd_geometry_bit_identical(tmp_path):
    """Odd content height (int-floor) still matches the square path."""
    path = str(tmp_path / "odd.mp4")
    rng = np.random.default_rng(4)
    # 126x224 → S=64: scale = min(64/126, 64/224) = 64/224 → nh = 36, nw = 64
    # pick dims giving an ODD nh: 130x224 → scale 64/224 → nh = int(37.14)=37
    frames = (rng.random((8, 130, 224, 3)) * 255).astype(np.uint8)
    encode_video(path, frames, fps=4.0)
    S = 64
    nh, nw, _, _ = letterbox_geometry(130, 224, S)
    assert nh % 2 == 1  # the interesting case
    box = (nh + 1, nw)

    sq = _dataset(path, None).get(0, epoch=0)
    cb = _dataset(path, box).get(0, epoch=0)
    cfg = AugmentConfig()
    fn = make_eval_preprocess(cfg, S, out_dtype=jnp.float32)
    out_sq = np.asarray(fn(jnp.asarray(sq["frames"][None])))
    out_cb = np.asarray(fn(jnp.asarray(cb["frames"][None])))
    np.testing.assert_array_equal(out_sq, out_cb)


def test_trainer_disables_content_box_on_mixed_aspect(tmp_path):
    """Heterogeneous aspect ratios → guard falls back to square decode."""
    import pandas as pd

    from vision_collision_detection_tpu.config import ExperimentConfig
    from vision_collision_detection_tpu.data import (
        create_datasets_with_manual_split,
    )
    from vision_collision_detection_tpu.train import Trainer

    rng = np.random.default_rng(5)
    rows = []
    for i, (h, w) in enumerate([(120, 160), (90, 160), (120, 160),
                                (120, 160)]):
        p = str(tmp_path / f"v{i}.mp4")
        encode_video(p, (rng.random((8, h, w, 3)) * 255).astype(np.uint8),
                     fps=4.0)
        rows.append({"id": f"v{i}", "video_path": p,
                     "video_type": ["Normal", "Collision"][i % 2],
                     "split": ["train", "train", "val", "test"][i],
                     "sensor_path": ""})
    df = pd.DataFrame(rows)
    train, val, test = create_datasets_with_manual_split(
        df, fps=4, duration=1, frame_size=32)
    cfg = ExperimentConfig().override({
        "model.backbone": "resnet18", "model.temporal_mode": "pooling",
        "model.dtype": "float32", "model.num_classes": 2,
        "data.num_classes": 2, "data.class_names": ("Normal", "Collision"),
        "data.fps": 4, "data.duration": 1, "data.frame_size": 32,
        "data.batch_size": 2, "data.num_workers": 2,
        "data.content_box_transfer": True,
        "train.epochs": 1, "train.validation_freq": 0,
        "train.log_every_steps": 0, "train.dashboard": False,
        "augment.enabled": False, "augment.horizontal_flip_prob": 0.0,
        "augment.blur_sigma": 0.0,
    })
    tr = Trainer(cfg, train, val, test, run_dir=str(tmp_path / "run"))
    assert train.content_box is None  # guard tripped → square decode
    assert val.content_box is None and test.content_box is None


def test_trainer_enables_content_box_on_uniform_aspect(tmp_path):
    import pandas as pd

    from vision_collision_detection_tpu.config import ExperimentConfig
    from vision_collision_detection_tpu.data import (
        create_datasets_with_manual_split,
    )
    from vision_collision_detection_tpu.train import Trainer

    rng = np.random.default_rng(6)
    rows = []
    for i in range(4):
        p = str(tmp_path / f"v{i}.mp4")
        encode_video(p, (rng.random((8, 120, 160, 3)) * 255).astype(np.uint8),
                     fps=4.0)
        rows.append({"id": f"v{i}", "video_path": p,
                     "video_type": ["Normal", "Collision"][i % 2],
                     "split": ["train", "train", "val", "test"][i],
                     "sensor_path": ""})
    df = pd.DataFrame(rows)
    train, val, test = create_datasets_with_manual_split(
        df, fps=4, duration=1, frame_size=32)
    cfg = ExperimentConfig().override({
        "model.backbone": "resnet18", "model.temporal_mode": "pooling",
        "model.dtype": "float32", "model.num_classes": 2,
        "data.num_classes": 2, "data.class_names": ("Normal", "Collision"),
        "data.fps": 4, "data.duration": 1, "data.frame_size": 32,
        "data.batch_size": 2, "data.num_workers": 2,
        "data.content_box_transfer": True,
        "train.epochs": 1, "train.validation_freq": 0,
        "train.log_every_steps": 0, "train.dashboard": False,
        "augment.enabled": False, "augment.horizontal_flip_prob": 0.0,
        "augment.blur_sigma": 0.0,
    })
    Trainer(cfg, train, val, test, run_dir=str(tmp_path / "run"))
    # 120x160 → 32: nh = int(120 * 0.2) = 24 (even) → box (24, 32)
    assert train.content_box == (24, 32)


def test_cpp_resampler_matches_torch_antialias(video_120x160):
    """The C++ decode-time letterbox resize must match torchvision's
    F.resize(antialias=True) filter (the reference's transform,
    /root/reference/nexar_video_aug.py:723-736) up to uint8 wire
    quantization (0.5/255) — this is what keeps the content-box fast path
    inside the AUC-parity budget."""
    import torch
    import torch.nn.functional as tF

    from vision_collision_detection_tpu.media.decoder import decode_frames

    S = 64
    frames = decode_frames(video_120x160, list(range(8)))  # native [8,120,160,3]
    nh, nw, ph, pw = letterbox_geometry(120, 160, S)

    t = torch.from_numpy(frames).permute(0, 3, 1, 2).float() / 255.0
    ref = tF.interpolate(t, size=(nh, nw), mode="bilinear",
                         align_corners=False, antialias=True)
    ref = ref.permute(0, 2, 3, 1).numpy()  # [8, nh, nw, 3] float

    box = (nh + nh % 2, nw)
    cb = _dataset(video_120x160, box).get(0, epoch=0)["frames"]
    got = cb[:, :nh, :nw].astype(np.float32) / 255.0

    # center sampling takes 4 of the 8 frames starting at (8-4)//2 = 2
    d = np.abs(got - ref[2:2 + got.shape[0]])
    assert d.max() <= 0.5 / 255 + 1e-6, f"max diff {d.max()}"
    assert d.mean() < 1e-3

def test_trainer_logs_when_probe_failure_disables_content_box(
        tmp_path, monkeypatch):
    """The probe-failure fallback must be LOUD: a run silently losing the
    content-box optimization is invisible in throughput triage otherwise
    (round-4 verdict #8 — the sibling mixed-aspect branch already logs)."""
    import pandas as pd

    import vision_collision_detection_tpu.media.decoder as dec
    from vision_collision_detection_tpu.config import ExperimentConfig
    from vision_collision_detection_tpu.data import (
        create_datasets_with_manual_split,
    )
    from vision_collision_detection_tpu.train import Trainer

    rng = np.random.default_rng(7)
    rows = []
    for i in range(4):
        p = str(tmp_path / f"v{i}.mp4")
        encode_video(p, (rng.random((8, 120, 160, 3)) * 255).astype(np.uint8),
                     fps=4.0)
        rows.append({"id": f"v{i}", "video_path": p,
                     "video_type": ["Normal", "Collision"][i % 2],
                     "split": ["train", "train", "val", "test"][i],
                     "sensor_path": ""})
    train, val, test = create_datasets_with_manual_split(
        pd.DataFrame(rows), fps=4, duration=1, frame_size=32)

    def broken_probe(path):
        raise RuntimeError("probe exploded")

    monkeypatch.setattr(dec, "probe", broken_probe)
    cfg = ExperimentConfig().override({
        "model.backbone": "resnet18", "model.temporal_mode": "pooling",
        "model.dtype": "float32", "model.num_classes": 2,
        "data.num_classes": 2, "data.class_names": ("Normal", "Collision"),
        "data.fps": 4, "data.duration": 1, "data.frame_size": 32,
        "data.batch_size": 2, "data.num_workers": 2,
        "data.content_box_transfer": True,
        "train.epochs": 1, "train.validation_freq": 0,
        "train.log_every_steps": 0, "train.dashboard": False,
        "augment.enabled": False, "augment.horizontal_flip_prob": 0.0,
        "augment.blur_sigma": 0.0,
    })
    run_dir = str(tmp_path / "run")
    tr = Trainer(cfg, train, val, test, run_dir=run_dir)
    assert train.content_box is None
    with open(f"{run_dir}/training.log") as f:
        log_text = f.read()
    assert "content-box transfer disabled" in log_text
    assert "probe exploded" in log_text
