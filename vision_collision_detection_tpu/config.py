"""Single dataclass config tree for the whole framework.

The reference scatters hyperparameters across four argparse CLIs, a bash
launcher's env vars, and a ``hyperparams`` dict persisted inside checkpoints
(/root/reference/nexar_train_distributed.py:50-110,
/root/reference/run_nexar_training.sh:13-22,
/root/reference/nexar_train.py:1622-1641). Here one nested dataclass tree is
the single source of truth: the CLI parses into it, the trainer reads from it,
and checkpoints persist it so inference can reconstruct the architecture
(mirroring /root/reference/nexar_inference.py:55-81).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Mapping, Sequence

BACKBONES = (
    # Same menu as /root/reference/nexar_arch.py:4-15 (torchvision imports).
    "resnet18",
    "resnet50",
    "mobilenet_v2",
    "mobilenet_v3_small",
    "efficientnet_v2_s",
    "efficientnet_v2_m",
    "efficientnet_v2_l",
    "convnext_tiny",
    "convnext_base",
    "convnext_large",
    # TPU-first scaled variant (BASELINE.json config 5): factorized video ViT.
    "vivit_tiny",  # CI/dryrun preset
    "vivit_small",
    "vivit_base",
)

TEMPORAL_MODES = ("attention", "conv", "pooling", "rnn", "lstm", "gru")

SAMPLE_STRATEGIES = ("random", "center", "metadata_time", "uniform")


@dataclass
class DataConfig:
    """Clip-loading configuration (reference: /root/reference/nexar_videos.py:39-67)."""

    fps: int = 10
    duration: int = 5  # seconds → num_frames = fps * duration
    frame_size: int = 224  # square letterbox target
    sample_strategy: str = "center"  # random | center | metadata_time | uniform
    load_sensor_data: bool = False
    sensor_dim: int = 4  # [accel_x, accel_y, accel_z, total]
    num_classes: int = 3
    class_names: tuple = ("Normal", "Near Collision", "Collision")
    # Split fractions for the stratified auto-split
    # (/root/reference/nexar_videos.py:912-924).
    train_frac: float = 0.70
    val_frac: float = 0.15
    test_frac: float = 0.15
    min_samples_per_class: int = 5  # drop classes below this (nexar_videos.py:896-908)
    # Host loader
    batch_size: int = 8  # per device
    num_workers: int = 8
    prefetch_depth: int = 2
    drop_last_train: bool = True
    seed: int = 42
    # Ship letterbox CONTENT rows only and pad black bars on-device
    # (bit-exact; ~44% fewer host→device bytes for 16:9 sources). Requires a
    # probeable first video; disabled automatically when probing fails.
    content_box_transfer: bool = True
    # Planar-YUV fast resize in the C++ decoder: ~35% cheaper decode per
    # clip. NOT bit-exact vs torchvision's AA resize (chroma interpolation
    # order + one dropped uint8 quantization; |Δ| ≤ ~4/255 per pixel, AUC
    # parity pinned by scripts/parity_harness.py --fast-resize). Off by
    # default: the exact path remains the reference-parity contract.
    fast_resize: bool = False
    # Reduced-resolution decode at 1/2^k size (0 = full res, the default).
    # libavcodec decodes mpeg4/mjpeg/mpeg2 directly at reduced size (DCT
    # crop) — ~1.8x cheaper decode at k=1 for 720p sources; H.264 falls
    # back to full-res transparently, and the level is clamped per clip so
    # the decoded frame still covers the letterbox content box. NOT
    # bit-exact vs full-res decode (AUC parity pinned by
    # scripts/parity_harness.py --lowres). Off by default: the exact path
    # remains the reference-parity contract.
    lowres_decode: int = 0

    @property
    def num_frames(self) -> int:
        return self.fps * self.duration


@dataclass
class AugmentConfig:
    """On-device augmentation params.

    Same knob surface (ranges + probabilities) as ``VideoAugmentation`` /
    ``create_video_transforms`` (/root/reference/nexar_video_aug.py:18-96,
    636-700); parameters are sampled ONCE per clip for temporal consistency
    (reference :97-182) via per-clip PRNG keys, then applied to all T frames
    in one fused jitted program. Defaults mirror the production-tuned recipe
    at /root/reference/nexar_complete_with_validation.py:1208-1225.
    """

    enabled: bool = True
    aug_probability: float = 0.9  # per-clip skip gate (reference :112-114)
    # Color (factor ranges)
    brightness_range: tuple = (0.9, 1.1)
    contrast_range: tuple = (0.9, 1.1)
    saturation_range: tuple = (0.9, 1.1)
    hue_range: tuple = (-0.05, 0.05)  # absolute shift, -0.5..0.5 of full cycle
    # Geometry (affine; sampled per clip, same warp for all frames)
    rotation_range: tuple = (-7.0, 7.0)  # degrees
    scale_range: tuple = (0.95, 1.1)
    shear_range: tuple = (-2.0, 2.0)  # degrees (x-shear)
    translate_range: tuple = (0.0, 0.07)  # fraction of W/H; sign randomized
    # 'separable': two-pass matmul warp (TPU-fast; the 4-tap gather warp
    # profiled at 41% of the whole train step). 'gather': direct 2-D
    # bilinear, torchvision-exact filter.
    affine_mode: str = "separable"
    # Special effects
    grayscale_prob: float = 0.02
    noise_level: float = 0.0  # gaussian std; 0 disables (unconditional if >0)
    blur_sigma: float = 0.5  # 0 disables (unconditional if >0); static kernel
    # Cutout (boxes pre-generated per clip, reference :144-169)
    cutout_prob: float = 0.1
    cutout_count_range: tuple = (1, 2)
    cutout_size_range: tuple = (0.1, 0.15)  # fraction of H/W
    # Extreme effects
    color_inversion_prob: float = 0.0
    solarization_prob: float = 0.0
    solarization_threshold: float = 0.5
    posterization_prob: float = 0.0
    posterization_bits_range: tuple = (3, 6)
    # Flip applied at transform level (reference create_video_transforms :745-757)
    horizontal_flip_prob: float = 0.5
    # Normalization (reference :793-801)
    normalize_mean: tuple = (0.45, 0.45, 0.45)
    normalize_std: tuple = (0.225, 0.225, 0.225)


@dataclass
class ModelConfig:
    """Architecture config (reference: EnhancedFrameCNN, /root/reference/nexar_arch.py:250-341)."""

    backbone: str = "convnext_tiny"
    temporal_mode: str = "gru"
    num_classes: int = 3
    pretrained: bool = False  # load converted torchvision weights if available
    pretrained_path: str = ""  # path to converted .npz weights
    hidden_dim: int = 512  # classifier MLP: feat → 512 → 256 → num_classes
    temporal_hidden_dim: int = 256  # RNN hidden size / attention dim
    attention_heads: int = 4
    max_seq_length: int = 30  # attention positional table (nexar_arch.py:44-47)
    bidirectional: bool = True  # RNN heads (nexar_arch.py:235-239)
    dropout: float = 0.5
    # IMU sensor fusion: the reference loads synchronized accelerometer
    # streams (/root/reference/nexar_videos.py:454-477) but its model never
    # consumes them; enabling this fuses a temporal sensor encoding into the
    # classifier (requires data.load_sensor_data).
    use_sensor: bool = False
    sensor_hidden_dim: int = 64
    frame_subsample: int = 2  # take every k-th frame when T > subsample_threshold
    subsample_threshold: int = 10  # (nexar_arch.py:412-415: ::2 when T>10)
    dtype: str = "bfloat16"  # compute dtype; params stay float32
    # tanh-approx GELU in the convnext blocks. Profiled on-chip
    # (PROFILE_r03.json): exact-erf GELU cost 121 ms of a 403 ms train step
    # and 49 ms of a 145 ms eval step at B=16 — the erf chain dominates the
    # fused pointwise-conv epilogues. tanh-GELU differs from erf-GELU by
    # ≤3e-3 absolute (irrelevant for training / fine-tuning); the
    # checkpoint-import parity model (ReferenceVideoClassifier) always uses
    # exact erf regardless of this flag.
    gelu_approximate: bool = True
    # ViViT-specific
    patch_size: int = 14
    image_size: int = 224
    remat: bool = False  # rematerialize transformer blocks (memory for FLOPs)
    # "flash" uses the Pallas TPU flash-attention kernel for the spatial
    # blocks (ops/flash_attention.py); the S×S attention matrix never hits
    # HBM in fwd or bwd. Measured on v5e (FLASH_AB_r04.json): XLA's fused
    # attention WINS at the 336px spatial seq (576 tokens, kernel 0.68×,
    # step-level 0.33×); flash only pulls ahead at ≥1024 tokens (448px:
    # 1.37× fwd / 1.10× fwd+bwd) — so "xla" stays the default and "flash"
    # is the opt-in for ≥448px scaled configs. Falls back to the XLA path
    # off-TPU; parameter trees are identical so checkpoints swap freely.
    attention_impl: str = "xla"

    def backbone_feature_dim(self) -> int:
        from vision_collision_detection_tpu.models.backbones import feature_dim

        return feature_dim(self.backbone)


@dataclass
class OptimConfig:
    """Optimizer/schedule config (reference: nexar_train.py:902-915)."""

    optimizer: str = "adamw"
    learning_rate: float = 1e-4
    weight_decay: float = 1e-4
    beta1: float = 0.9
    beta2: float = 0.999
    # CosineAnnealingLR(T_max=30, eta_min=lr/100) equivalent; T_max in epochs.
    schedule: str = "cosine"
    cosine_t_max_epochs: int = 30
    eta_min_ratio: float = 0.01
    warmup_steps: int = 0
    grad_clip_norm: float = 0.0  # 0 disables
    loss_type: str = "cross_entropy"  # or "bce" (nexar_train.py:884-898)
    label_smoothing: float = 0.0
    use_class_weights: bool = True  # inverse-frequency (nexar_train.py:2004-2006)


@dataclass
class TrainConfig:
    epochs: int = 15
    patience: int = 5  # early-stop epochs without val-loss improvement
    validation_freq: int = 2  # mini-validations per epoch (nexar_train.py:1204)
    mini_val_batches: int = 25  # (nexar_train.py:1282)
    mixed_precision: bool = True  # bf16 activations; no GradScaler needed on TPU
    log_every_steps: int = 10
    checkpoint_every_epochs: int = 1
    keep_checkpoints: int = 3
    seed: int = 42
    resume: bool = False  # true mid-training resume (reference lacks this)
    deterministic_data: bool = True
    dashboard: bool = False  # live console+HTML dashboard (obs.dashboard)
    profile_steps: int = 0  # capture a jax.profiler trace of the first N steps


@dataclass
class MeshConfig:
    """Device-mesh config. Reference parallelism is DP-only
    (/root/reference/distributed_video_classifier.py:157); we keep a 2-D mesh
    so the scaled ViViT variant can shard the model axis later."""

    data_axis: str = "data"
    model_axis: str = "model"
    num_data: int = -1  # -1 → all devices on the data axis
    num_model: int = 1


@dataclass
class ExperimentConfig:
    """Root config."""

    data: DataConfig = field(default_factory=DataConfig)
    augment: AugmentConfig = field(default_factory=AugmentConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    # Experiment bookkeeping (reference naming: {model}_{temporal}_{timestamp},
    # /root/reference/nexar_train.py:727).
    experiment_name: str = ""
    save_dir: str = "runs"
    metadata_csv: str = ""
    video_dirs: tuple = ()

    def name(self) -> str:
        if self.experiment_name:
            return self.experiment_name
        return f"{self.model.backbone}_{self.model.temporal_mode}"

    # ---- serialization (the checkpoint "hyperparams contract") ----

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, default=_json_default)

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "ExperimentConfig":
        # Back-compat: checkpoints saved before gelu_approximate existed
        # were trained with erf-GELU (the old behavior). Reconstructing
        # them must not silently pick up the new tanh default — evaluate
        # with the numerics they were trained with.
        if "model" in d and "gelu_approximate" not in d["model"]:
            d = dict(d)
            d["model"] = dict(d["model"], gelu_approximate=False)
        return _dataclass_from_dict(cls, d)

    @classmethod
    def from_json(cls, s: str) -> "ExperimentConfig":
        return cls.from_dict(json.loads(s))

    def override(self, dotted: Mapping[str, Any]) -> "ExperimentConfig":
        """Apply {'model.backbone': 'resnet18', ...} style overrides, returning a copy."""
        cfg = self.from_dict(self.to_dict())
        for key, value in dotted.items():
            parts = key.split(".")
            obj = cfg
            for p in parts[:-1]:
                obj = getattr(obj, p)
            leaf = parts[-1]
            if not hasattr(obj, leaf):
                raise KeyError(f"Unknown config key: {key}")
            current = getattr(obj, leaf)
            if current is not None and not isinstance(current, (list, tuple, dict)):
                value = type(current)(value) if value is not None else value
            setattr(obj, leaf, value)
        cfg.validate()
        return cfg

    def validate(self) -> None:
        if self.model.backbone not in BACKBONES:
            raise ValueError(
                f"backbone {self.model.backbone!r} not in {BACKBONES}"
            )
        if self.model.temporal_mode not in TEMPORAL_MODES:
            raise ValueError(
                f"temporal_mode {self.model.temporal_mode!r} not in {TEMPORAL_MODES}"
            )
        if self.data.sample_strategy not in SAMPLE_STRATEGIES:
            raise ValueError(
                f"sample_strategy {self.data.sample_strategy!r} not in {SAMPLE_STRATEGIES}"
            )
        if self.data.num_classes != self.model.num_classes:
            raise ValueError("data.num_classes must match model.num_classes")
        if self.model.attention_impl not in ("xla", "flash"):
            # A typo here would otherwise fall through TransformerBlock's
            # else-branch onto the XLA path while the user believes flash
            # attention is on (advisor finding).
            raise ValueError(
                f"attention_impl {self.model.attention_impl!r} not in "
                "('xla', 'flash')"
            )
        if not 0 <= int(self.data.lowres_decode) <= 3:
            # libavcodec's max_lowres is 3 (1/8 size); a silent out-of-range
            # value would be clamped in C and look like a no-op.
            raise ValueError(
                f"data.lowres_decode {self.data.lowres_decode!r} must be "
                "an int in 0..3"
            )
        if self.augment.affine_mode == "separable":
            # The two-pass matmul warp factors through 1/m11 ∝
            # 1/cos(rotation+shear) (ops/affine.py:123-126); keep the
            # sampled angles far from the ±90° singularity. Reference
            # ranges are ±7°/±2°; 45° leaves a 2× margin on the
            # conditioning while catching misconfiguration.
            worst = (max(abs(a) for a in self.augment.rotation_range)
                     + max(abs(s) for s in self.augment.shear_range))
            if worst > 45.0:
                raise ValueError(
                    f"rotation+shear up to {worst:.1f}° exceeds the "
                    "separable warp's valid regime (|rot+shear| ≤ 45°); "
                    "set augment.affine_mode='gather' for extreme angles"
                )


def _json_default(o):
    if isinstance(o, (tuple, set)):
        return list(o)
    raise TypeError(f"not JSON serializable: {type(o)}")


def _dataclass_from_dict(cls, d):
    if not dataclasses.is_dataclass(cls):
        return d
    kwargs = {}
    hints = {f.name: f for f in dataclasses.fields(cls)}
    for key, value in dict(d).items():
        if key not in hints:
            continue  # forward-compat: ignore unknown keys from old checkpoints
        f = hints[key]
        ftype = f.type if not isinstance(f.type, str) else None
        default = f.default_factory() if f.default_factory is not dataclasses.MISSING else f.default  # type: ignore
        if dataclasses.is_dataclass(default):
            kwargs[key] = _dataclass_from_dict(type(default), value)
        elif isinstance(default, tuple) and isinstance(value, (list, tuple)):
            kwargs[key] = tuple(value)
        else:
            kwargs[key] = value
    return cls(**kwargs)
