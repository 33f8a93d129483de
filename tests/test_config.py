import json

import pytest

from vision_collision_detection_tpu.config import ExperimentConfig


def test_roundtrip():
    cfg = ExperimentConfig()
    cfg2 = ExperimentConfig.from_json(cfg.to_json())
    assert cfg2.to_dict() == cfg.to_dict()
    assert cfg2.model.backbone == "convnext_tiny"
    assert cfg2.data.num_frames == 50


def test_override():
    cfg = ExperimentConfig().override(
        {"model.backbone": "resnet18", "optim.learning_rate": 3e-4, "train.epochs": 2}
    )
    assert cfg.model.backbone == "resnet18"
    assert cfg.optim.learning_rate == pytest.approx(3e-4)
    assert cfg.train.epochs == 2
    # original untouched
    assert ExperimentConfig().model.backbone == "convnext_tiny"


def test_validate_rejects_bad_backbone():
    with pytest.raises(ValueError):
        ExperimentConfig().override({"model.backbone": "vgg16"})


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        ExperimentConfig().override({"model.nonexistent": 1})


def test_forward_compat_ignores_unknown_dict_keys():
    d = ExperimentConfig().to_dict()
    d["model"]["legacy_field"] = 123
    cfg = ExperimentConfig.from_dict(d)
    assert cfg.model.backbone == "convnext_tiny"


def test_validate_rejects_bad_attention_impl():
    from vision_collision_detection_tpu.config import ExperimentConfig

    import pytest

    cfg = ExperimentConfig()
    cfg.model.attention_impl = "flsh"  # the advisor's typo scenario
    with pytest.raises(ValueError, match="attention_impl"):
        cfg.validate()


def test_validate_accepts_both_attention_impls():
    from vision_collision_detection_tpu.config import ExperimentConfig

    for impl in ("xla", "flash"):
        cfg = ExperimentConfig()
        cfg.model.attention_impl = impl
        cfg.validate()


def test_validate_rejects_out_of_range_lowres_decode():
    from vision_collision_detection_tpu.config import ExperimentConfig

    import pytest

    for bad in (-1, 4, 7):
        cfg = ExperimentConfig()
        cfg.data.lowres_decode = bad
        with pytest.raises(ValueError, match="lowres_decode"):
            cfg.validate()
    for ok in (0, 1, 2, 3):
        cfg = ExperimentConfig()
        cfg.data.lowres_decode = ok
        cfg.validate()
