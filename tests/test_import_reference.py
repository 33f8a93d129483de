"""Full-model torch→flax checkpoint-import parity.

torchvision isn't installed; this file rebuilds the reference's
``EnhancedFrameCNN`` (/root/reference/nexar_arch.py:250-443) in plain torch
with identical attribute names → identical state_dict keys, then checks that
``convert_reference_checkpoint`` + ``ReferenceVideoClassifier`` reproduce the
torch eval logits. This is the AUC-parity anchor: it covers the backbone, all
temporal heads (incl. torch GRU/LSTM gate+bias folding), and the
BatchNorm1d classifier MLP.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

import flax

from test_convert import TorchResNet18
from vision_collision_detection_tpu.models.import_torch import (
    convert_reference_checkpoint,
    derive_hyperparams,
)
from vision_collision_detection_tpu.models.reference_model import (
    build_reference_model,
)


# ---------------------------------------------------------------------------
# Plain-torch mirrors of the reference modules (attribute names == reference
# → identical state_dict keys).
# ---------------------------------------------------------------------------
class TorchTemporalAttention(tnn.Module):
    """/root/reference/nexar_arch.py:17-80."""

    def __init__(self, feature_dim, num_heads=4, max_seq_length=30):
        super().__init__()
        self.attention = tnn.MultiheadAttention(
            embed_dim=feature_dim, num_heads=num_heads, dropout=0.0,
            batch_first=True)
        self.pos_encoder = tnn.Parameter(
            torch.zeros(1, max_seq_length, feature_dim))
        tnn.init.normal_(self.pos_encoder, mean=0, std=0.02)
        self.norm = tnn.LayerNorm(feature_dim)

    def forward(self, x):
        x = self.norm(x)
        x = x + self.pos_encoder[:, : x.size(1), :]
        attn_output, attn_weights = self.attention(query=x, key=x, value=x)
        return attn_output.mean(dim=1), attn_weights


class TorchTemporalConvolution(tnn.Module):
    """/root/reference/nexar_arch.py:83-119 (input [B, D, T])."""

    def __init__(self, feature_dim, kernel_size=3):
        super().__init__()
        padding = kernel_size // 2
        self.conv_block = tnn.Sequential(
            tnn.Conv1d(feature_dim, feature_dim, kernel_size, padding=padding),
            tnn.BatchNorm1d(feature_dim),
            tnn.ReLU(),
            tnn.Conv1d(feature_dim, feature_dim, kernel_size, padding=padding),
            tnn.BatchNorm1d(feature_dim),
            tnn.ReLU(),
            tnn.AdaptiveAvgPool1d(1),
        )

    def forward(self, x):
        return self.conv_block(x).squeeze(-1), None


class TorchAdaptivePooling(tnn.Module):
    """/root/reference/nexar_arch.py:122-146 (input [B, D, T])."""

    def __init__(self, feature_dim):
        super().__init__()
        self.pool = tnn.AdaptiveAvgPool1d(1)

    def forward(self, x):
        return self.pool(x).squeeze(-1), None


class TorchTemporalRNN(tnn.Module):
    """/root/reference/nexar_arch.py:149-247."""

    def __init__(self, feature_dim, hidden_dim=512, rnn_type="gru",
                 num_layers=2, bidirectional=True):
        super().__init__()
        self.hidden_dim = hidden_dim
        self.rnn_type = rnn_type
        self.num_layers = num_layers
        self.bidirectional = bidirectional
        self.num_directions = 2 if bidirectional else 1
        cls = {"rnn": tnn.RNN, "lstm": tnn.LSTM, "gru": tnn.GRU}[rnn_type]
        self.rnn = cls(input_size=feature_dim, hidden_size=hidden_dim,
                       num_layers=num_layers, batch_first=True,
                       bidirectional=bidirectional)
        output_dim = hidden_dim * self.num_directions
        if output_dim != feature_dim:
            self.projection = tnn.Linear(output_dim, feature_dim)
        else:
            self.projection = tnn.Identity()
        self.norm = tnn.LayerNorm(feature_dim)

    def forward(self, x):
        x = self.norm(x)
        if self.rnn_type == "lstm":
            output, (hidden, cell) = self.rnn(x)
        else:
            output, hidden = self.rnn(x)
        if self.bidirectional:
            nl, nd = self.num_layers, self.num_directions
            last_layer_hidden = hidden[nl * nd - 2: nl * nd, :, :]
            last_hidden = last_layer_hidden.transpose(0, 1).contiguous().view(
                -1, self.hidden_dim * self.num_directions)
        else:
            last_hidden = hidden[-1]
        return self.projection(last_hidden), None


class Permute(tnn.Module):
    def __init__(self, dims):
        super().__init__()
        self.dims = dims

    def forward(self, x):
        return x.permute(self.dims)


class LayerNorm2d(tnn.LayerNorm):
    """torchvision.models.convnext.LayerNorm2d: LN over C of NCHW."""

    def forward(self, x):
        x = x.permute(0, 2, 3, 1)
        x = tnn.functional.layer_norm(
            x, self.normalized_shape, self.weight, self.bias, self.eps)
        return x.permute(0, 3, 1, 2)


class TorchCNBlock(tnn.Module):
    """torchvision CNBlock: state_dict keys block.{0,2,3,5} + layer_scale."""

    def __init__(self, dim, layer_scale=1e-6):
        super().__init__()
        self.block = tnn.Sequential(
            tnn.Conv2d(dim, dim, 7, padding=3, groups=dim, bias=True),
            Permute([0, 2, 3, 1]),
            tnn.LayerNorm(dim, eps=1e-6),
            tnn.Linear(dim, 4 * dim),
            tnn.GELU(),
            tnn.Linear(4 * dim, dim),
            Permute([0, 3, 1, 2]),
        )
        self.layer_scale = tnn.Parameter(torch.ones(dim, 1, 1) * layer_scale)

    def forward(self, x):
        return x + self.layer_scale * self.block(x)


class TorchConvNeXtTiny(tnn.Module):
    """torchvision convnext_tiny nesting (features.{0..7}); classifier
    removed as EnhancedFrameCNN does (/root/reference/nexar_arch.py:324-328),
    so the final LayerNorm2d is absent from the feature path."""

    def __init__(self, depths=(3, 3, 9, 3), dims=(96, 192, 384, 768)):
        super().__init__()
        feats = [tnn.Sequential(
            tnn.Conv2d(3, dims[0], 4, stride=4, bias=True),
            LayerNorm2d(dims[0], eps=1e-6),
        )]
        for stage in range(4):
            if stage > 0:
                feats.append(tnn.Sequential(
                    LayerNorm2d(dims[stage - 1], eps=1e-6),
                    tnn.Conv2d(dims[stage - 1], dims[stage], 2, stride=2),
                ))
            feats.append(tnn.Sequential(
                *[TorchCNBlock(dims[stage]) for _ in range(depths[stage])]))
        self.features = tnn.Sequential(*feats)

    def forward(self, x):
        return self.features(x).mean(dim=(2, 3))  # avgpool → [N, D]


class TorchEnhancedFrameCNN(tnn.Module):
    """/root/reference/nexar_arch.py:250-443 with a provided backbone."""

    def __init__(self, backbone, feature_dim, temporal_mode="gru",
                 num_classes=3, attention_heads=4, rnn_hidden_dim=512,
                 rnn_num_layers=2, rnn_bidirectional=True):
        super().__init__()
        self.backbone = backbone
        self.temporal_mode = temporal_mode
        if temporal_mode == "attention":
            self.temporal_aggregation = TorchTemporalAttention(
                feature_dim, num_heads=attention_heads)
        elif temporal_mode == "convolution":
            self.temporal_aggregation = TorchTemporalConvolution(feature_dim)
        elif temporal_mode == "pooling":
            self.temporal_aggregation = TorchAdaptivePooling(feature_dim)
        else:
            self.temporal_aggregation = TorchTemporalRNN(
                feature_dim, hidden_dim=rnn_hidden_dim,
                rnn_type=temporal_mode, num_layers=rnn_num_layers,
                bidirectional=rnn_bidirectional)
        self.classifier = tnn.Sequential(
            tnn.Linear(feature_dim, 512), tnn.BatchNorm1d(512), tnn.ReLU(),
            tnn.Dropout(0.5), tnn.Linear(512, 256), tnn.BatchNorm1d(256),
            tnn.ReLU(), tnn.Dropout(0.5), tnn.Linear(256, num_classes))

    def forward(self, x):
        # [B, T, H, W, C] → [B, C, T, H, W] (:401-409), ::2 subsample (:412-415)
        x = x.permute(0, 4, 1, 2, 3)
        B, C, T, H, W = x.shape
        if T > 10:
            x = x[:, :, ::2, :, :]
            T = x.shape[2]
        x = x.permute(0, 2, 1, 3, 4).reshape(B * T, C, H, W)
        feats = self.backbone(x).reshape(B, T, -1)
        if self.temporal_mode in ("attention", "rnn", "lstm", "gru"):
            pooled, _ = self.temporal_aggregation(feats)
        else:
            pooled, _ = self.temporal_aggregation(feats.permute(0, 2, 1))
        return self.classifier(pooled)


# ---------------------------------------------------------------------------
def _randomize_running_stats(m):
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, (tnn.BatchNorm1d, tnn.BatchNorm2d)):
                mod.running_mean.uniform_(-0.2, 0.2)
                mod.running_var.uniform_(0.8, 1.2)


def _flax_logits(model, variables, x_np):
    dummy = jnp.zeros(x_np.shape, jnp.float32)
    init = model.init({"params": jax.random.PRNGKey(0)}, dummy, train=False)
    params = flax.serialization.from_state_dict(
        flax.core.unfreeze(init["params"]), variables["params"])
    batch_stats = flax.serialization.from_state_dict(
        flax.core.unfreeze(init.get("batch_stats", {})),
        variables["batch_stats"])
    out = model.apply({"params": params, "batch_stats": batch_stats},
                      jnp.asarray(x_np), train=False)
    return np.asarray(out)


def _roundtrip(torch_model, hyperparams, x_np, atol):
    torch_model.eval()
    ckpt = {"model_state_dict": torch_model.state_dict(),
            "hyperparams": hyperparams}
    hp, variables = convert_reference_checkpoint(ckpt)
    model = build_reference_model(hp)
    with torch.no_grad():
        ref = torch_model(torch.from_numpy(x_np)).numpy()
    out = _flax_logits(model, variables, x_np)
    np.testing.assert_allclose(out, ref, atol=atol, rtol=1e-4)
    return hp


# -------------------- full-model parity (VERDICT round-1 #1) ---------------
def test_full_model_convnext_tiny_gru_parity():
    torch.manual_seed(0)
    m = TorchEnhancedFrameCNN(TorchConvNeXtTiny(), 768, "gru", num_classes=3)
    _randomize_running_stats(m)
    x = np.random.default_rng(0).random((2, 12, 64, 64, 3)).astype(np.float32)
    hp = _roundtrip(m, {"base_model": "convnext_tiny", "temporal_mode": "gru",
                        "num_classes": 3}, x, atol=1e-4)
    assert hp["rnn_hidden_dim"] == 512 and hp["rnn_num_layers"] == 2


def test_full_model_resnet18_attention_parity():
    torch.manual_seed(1)
    m = TorchEnhancedFrameCNN(TorchResNet18(), 512, "attention", num_classes=3)
    _randomize_running_stats(m)
    x = np.random.default_rng(1).random((2, 12, 64, 64, 3)).astype(np.float32)
    _roundtrip(m, {"base_model": "resnet18", "temporal_mode": "attention",
                   "num_classes": 3}, x, atol=1e-4)


# -------------------- attention_heads contract guard (VERDICT r2 #4) -------
def test_attention_8_heads_parity():
    """A non-default head count must survive the import round trip — logit
    parity proves the softmax grouping matched, not just the shapes."""
    torch.manual_seed(11)
    m = TorchEnhancedFrameCNN(TorchResNet18(), 512, "attention",
                              num_classes=3, attention_heads=8)
    _randomize_running_stats(m)
    x = np.random.default_rng(11).random((2, 12, 64, 64, 3)).astype(np.float32)
    hp = _roundtrip(m, {"base_model": "resnet18", "temporal_mode": "attention",
                        "num_classes": 3, "attention_heads": 8}, x, atol=1e-4)
    assert hp["attention_heads"] == 8


def test_attention_heads_contract_contradiction_raises():
    """hyperparams claiming a head count that does not divide the embed dim
    is a corrupt contract — must fail loudly, not silently mis-group."""
    torch.manual_seed(12)
    m = TorchEnhancedFrameCNN(TorchResNet18(), 512, "attention", num_classes=3)
    sd = m.state_dict()
    with pytest.raises(ValueError, match="attention_heads"):
        derive_hyperparams(sd, {"base_model": "resnet18",
                                "attention_heads": 7})


def test_attention_heads_missing_warns_and_defaults():
    torch.manual_seed(13)
    m = TorchEnhancedFrameCNN(TorchResNet18(), 512, "attention", num_classes=3)
    sd = m.state_dict()
    with pytest.warns(UserWarning, match="attention_heads"):
        hp = derive_hyperparams(sd, {"base_model": "resnet18"})
    assert hp["attention_heads"] == 4


# -------------------- 5-way head sweep (tiny backbone skipped; heads are
# exercised through resnet18 to keep the converter honest end-to-end) -------
@pytest.mark.parametrize("mode", ["lstm", "rnn", "convolution", "pooling"])
def test_full_model_resnet18_other_heads_parity(mode):
    torch.manual_seed(2)
    m = TorchEnhancedFrameCNN(TorchResNet18(), 512, mode, num_classes=3,
                              rnn_hidden_dim=64, rnn_num_layers=2)
    _randomize_running_stats(m)
    x = np.random.default_rng(2).random((1, 12, 64, 64, 3)).astype(np.float32)
    hp = _roundtrip(m, {"base_model": "resnet18", "temporal_mode": mode,
                        "num_classes": 3}, x, atol=1e-4)
    if mode in ("lstm", "rnn"):
        assert hp["temporal_mode"] == mode  # gate-ratio inference


def test_unidirectional_gru_and_shape_inference():
    """bidirectional=False path + hyperparams derived purely from shapes."""
    torch.manual_seed(3)
    m = TorchEnhancedFrameCNN(TorchResNet18(), 512, "gru", num_classes=5,
                              rnn_hidden_dim=96, rnn_num_layers=3,
                              rnn_bidirectional=False)
    _randomize_running_stats(m)
    m.eval()
    sd = m.state_dict()
    hp = derive_hyperparams(sd, {"base_model": "resnet18"})
    assert hp["temporal_mode"] == "gru"
    assert hp["rnn_hidden_dim"] == 96
    assert hp["rnn_num_layers"] == 3
    assert hp["rnn_bidirectional"] is False
    assert hp["num_classes"] == 5
    x = np.random.default_rng(3).random((1, 12, 64, 64, 3)).astype(np.float32)
    _roundtrip(m, {"base_model": "resnet18"}, x, atol=1e-4)


def test_ddp_module_prefix_tolerated():
    torch.manual_seed(4)
    m = TorchEnhancedFrameCNN(TorchResNet18(), 512, "pooling", num_classes=3)
    _randomize_running_stats(m)
    m.eval()
    sd = {f"module.{k}": v for k, v in m.state_dict().items()}
    hp, variables = convert_reference_checkpoint(
        {"model_state_dict": sd,
         "hyperparams": {"base_model": "resnet18",
                         "temporal_mode": "pooling", "num_classes": 3}})
    x = np.random.default_rng(4).random((1, 12, 64, 64, 3)).astype(np.float32)
    model = build_reference_model(hp)
    with torch.no_grad():
        ref = m(torch.from_numpy(x)).numpy()
    out = _flax_logits(model, variables, x)
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)


# -------------------- end-to-end pathway (VERDICT round-1 #9) --------------
def test_full_checkpoint_cli_and_predictor(tmp_path):
    """torch .pth → cli.convert_weights --full → torch-free predictor →
    predictions on a real synthetic MP4; .pth and .npz loads must agree."""
    from vision_collision_detection_tpu.cli.convert_weights import main as cvt
    from vision_collision_detection_tpu.infer import CollisionPredictor
    from vision_collision_detection_tpu.media.decoder import encode_video

    torch.manual_seed(5)
    m = TorchEnhancedFrameCNN(TorchResNet18(), 512, "pooling", num_classes=3)
    _randomize_running_stats(m)
    m.eval()
    pth = tmp_path / "best_model.pth"
    torch.save({"model_state_dict": m.state_dict(),
                "hyperparams": {"base_model": "resnet18",
                                "temporal_mode": "pooling",
                                "num_classes": 3}}, pth)

    npz = str(tmp_path / "model.npz")
    assert cvt(["--torch-checkpoint", str(pth), "--full",
                "--output", npz]) == 0

    rng = np.random.default_rng(7)
    clip = (rng.random((50, 72, 128, 3)) * 255).astype(np.uint8)
    video = str(tmp_path / "clip.mp4")
    encode_video(video, clip, fps=10.0)

    pred_npz = CollisionPredictor.from_torch_checkpoint(npz)
    res = pred_npz.predict(video, batch_size=1)
    assert len(res) == 1
    probs = np.array(list(res[0]["probabilities"].values()))
    np.testing.assert_allclose(probs.sum(), 1.0, atol=1e-4)
    assert res[0]["predicted_class"] in pred_npz.class_names

    pred_pth = CollisionPredictor.from_torch_checkpoint(str(pth))
    res2 = pred_pth.predict(video, batch_size=1)
    p1 = np.array(list(res[0]["probabilities"].values()))
    p2 = np.array(list(res2[0]["probabilities"].values()))
    np.testing.assert_allclose(p1, p2, atol=1e-5)


def test_train_with_pretrained_backbone_e2e(tmp_path):
    """Training with pretrained_path: the converted torchvision backbone
    must land in the Trainer's initial state and a full epoch must run
    (exercises train/steps.py:41-61 beyond unit level)."""
    import pandas as pd

    from vision_collision_detection_tpu.config import ExperimentConfig
    from vision_collision_detection_tpu.data import (
        create_datasets_with_manual_split,
    )
    from vision_collision_detection_tpu.media.synthetic import generate_dataset
    from vision_collision_detection_tpu.models.convert import (
        convert_torch_state_dict,
        save_npz,
    )
    from vision_collision_detection_tpu.train import Trainer

    torch.manual_seed(6)
    tm = TorchResNet18()
    tree = convert_torch_state_dict(tm.state_dict(), "resnet18")
    npz = str(tmp_path / "resnet18.npz")
    save_npz(tree, npz)

    csv = generate_dataset(
        str(tmp_path / "synth"), clips_per_class=2, num_frames=8, height=40,
        width=56, splits=("train", "val"),
    )
    df = pd.read_csv(csv).fillna({"sensor_path": ""})
    train, val, test = create_datasets_with_manual_split(
        df, fps=4, duration=1, frame_size=32,
    )
    cfg = ExperimentConfig().override({
        "model.backbone": "resnet18",
        "model.temporal_mode": "pooling",
        "model.dtype": "float32",
        "model.pretrained_path": npz,
        "data.fps": 4, "data.duration": 1, "data.frame_size": 32,
        "data.batch_size": 2, "data.num_workers": 2,
        "train.epochs": 1, "train.validation_freq": 0,
        "train.log_every_steps": 0, "train.dashboard": False,
        "augment.enabled": False, "augment.horizontal_flip_prob": 0.0,
        "augment.blur_sigma": 0.0,
    })
    tr = Trainer(cfg, train, val, run_dir=str(tmp_path / "run"))
    np.testing.assert_allclose(
        np.asarray(tr.state.params["backbone"]["stem_conv"]["kernel"]),
        tree["params"]["stem_conv"]["kernel"], rtol=1e-6,
    )
    hist = tr.train()
    assert len(hist.records) == 1
    # training moved the pretrained weights
    assert not np.allclose(
        np.asarray(tr.state.params["backbone"]["stem_conv"]["kernel"]),
        tree["params"]["stem_conv"]["kernel"],
    )
