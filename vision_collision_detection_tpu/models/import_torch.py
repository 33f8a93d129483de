"""Full reference-checkpoint importer: torch ``EnhancedFrameCNN`` → flax.

The reference's checkpoints are dicts with ``model_state_dict`` plus a
``hyperparams`` architecture contract that inference uses to rebuild the
model (/root/reference/nexar_inference.py:33-101,
/root/reference/nexar_train.py:1622-1641). This module converts such a
checkpoint — backbone + temporal head + classifier MLP — into variables for
``ReferenceVideoClassifier`` (models/reference_model.py), giving identical
fp32 eval logits.

Gate/bias mapping notes (the part that silently breaks AUC parity):
- torch GRU packs gates (r, z, n) in ``weight_ih_l*``; flax GRUCell keeps
  separate ir/iz/in + hr/hz/hn denses where hr/hz have NO bias — torch's
  b_hr/b_hz fold into the flax ir/iz biases (σ((Wx+bi)+(Wh+bh)) ≡
  σ(Wx+(bi+bh)+Wh)). The n-gate keeps b_in and b_hn separate because the
  reset gate multiplies only the hidden projection: torch computes
  n = tanh(W_in·x + b_in + r⊙(W_hn·h + b_hn)) and flax's ``in``/``hn``
  denses carry exactly those two biases.
- torch LSTM packs (i, f, g, o); flax's i* denses are bias-free, so
  b_ih + b_hh folds into the h* biases.
- torch RNN: both biases fold into the flax SimpleCell ``i`` bias.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from vision_collision_detection_tpu.models.convert import (
    _linear,
    _ln,
    _t,
    convert_torch_state_dict,
)


def _bn1d(sd, name) -> Tuple[dict, dict]:
    params = {"scale": _t(sd[f"{name}.weight"]),
              "bias": _t(sd[f"{name}.bias"])}
    stats = {"mean": _t(sd[f"{name}.running_mean"]),
             "var": _t(sd[f"{name}.running_var"])}
    return params, stats


def _conv1d(sd, name):
    # torch Conv1d weight [out, in, k] → flax Conv kernel [k, in, out]
    return {"kernel": np.transpose(_t(sd[f"{name}.weight"]), (2, 1, 0)),
            "bias": _t(sd[f"{name}.bias"])}


def _subdict(sd: Dict, prefix: str) -> Dict:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


# ---------------------------------------------------------------------------
# Temporal heads
# ---------------------------------------------------------------------------
def convert_attention_head(sd: Dict) -> Dict:
    """torch nn.MultiheadAttention packed-QKV → query/key/value/out denses
    (/root/reference/nexar_arch.py:36-47)."""
    w = _t(sd["attention.in_proj_weight"])  # [3D, D]
    b = _t(sd["attention.in_proj_bias"])    # [3D]
    d = w.shape[1]
    params = {
        "norm": _ln(sd, "norm"),
        "pos_embedding": _t(sd["pos_encoder"])[0],  # [1, max_seq, D] → [max_seq, D]
        "query": {"kernel": w[:d].T, "bias": b[:d]},
        "key": {"kernel": w[d:2 * d].T, "bias": b[d:2 * d]},
        "value": {"kernel": w[2 * d:].T, "bias": b[2 * d:]},
        "out": _linear(sd, "attention.out_proj"),
    }
    return params


def convert_conv_head(sd: Dict) -> Tuple[Dict, Dict]:
    """conv_block Sequential indices 0/1/3/4 (/root/reference/nexar_arch.py:98-106)."""
    params: Dict = {"conv1": _conv1d(sd, "conv_block.0"),
                    "conv2": _conv1d(sd, "conv_block.3")}
    stats: Dict = {}
    params["bn1"], stats["bn1"] = _bn1d(sd, "conv_block.1")
    params["bn2"], stats["bn2"] = _bn1d(sd, "conv_block.4")
    return params, stats


def _split_gates(w: np.ndarray, n: int):
    h = w.shape[0] // n
    return [w[i * h:(i + 1) * h] for i in range(n)]


def _gru_cell(wi, wh, bi, bh) -> Dict:
    (w_ir, w_iz, w_in), (w_hr, w_hz, w_hn) = _split_gates(wi, 3), _split_gates(wh, 3)
    (b_ir, b_iz, b_in), (b_hr, b_hz, b_hn) = _split_gates(bi, 3), _split_gates(bh, 3)
    return {
        "ir": {"kernel": w_ir.T, "bias": b_ir + b_hr},
        "iz": {"kernel": w_iz.T, "bias": b_iz + b_hz},
        "in": {"kernel": w_in.T, "bias": b_in},
        "hr": {"kernel": w_hr.T},
        "hz": {"kernel": w_hz.T},
        "hn": {"kernel": w_hn.T, "bias": b_hn},
    }


def _lstm_cell(wi, wh, bi, bh) -> Dict:
    wi4, wh4 = _split_gates(wi, 4), _split_gates(wh, 4)
    bi4, bh4 = _split_gates(bi, 4), _split_gates(bh, 4)
    out: Dict = {}
    for idx, g in enumerate("ifgo"):
        out[f"i{g}"] = {"kernel": wi4[idx].T}
        out[f"h{g}"] = {"kernel": wh4[idx].T, "bias": bi4[idx] + bh4[idx]}
    return out


def _simple_cell(wi, wh, bi, bh) -> Dict:
    return {"i": {"kernel": wi.T, "bias": bi + bh},
            "h": {"kernel": wh.T}}


_CELL_CONVERTERS = {"gru": _gru_cell, "lstm": _lstm_cell, "rnn": _simple_cell}


def convert_rnn_head(sd: Dict, cell_type: str, num_layers: int,
                     bidirectional: bool) -> Dict:
    """torch nn.{RNN,LSTM,GRU} stacked weights → per-layer flax cells
    (/root/reference/nexar_arch.py:174-212)."""
    conv = _CELL_CONVERTERS[cell_type]
    params: Dict = {"norm": _ln(sd, "norm")}
    dirs = [("fw", "")] + ([("bw", "_reverse")] if bidirectional else [])
    for layer in range(num_layers):
        for dname, suffix in dirs:
            wi = _t(sd[f"rnn.weight_ih_l{layer}{suffix}"])
            wh = _t(sd[f"rnn.weight_hh_l{layer}{suffix}"])
            bi = _t(sd[f"rnn.bias_ih_l{layer}{suffix}"])
            bh = _t(sd[f"rnn.bias_hh_l{layer}{suffix}"])
            params[f"l{layer}_{dname}_cell"] = conv(wi, wh, bi, bh)
    if "projection.weight" in sd:
        params["projection"] = _linear(sd, "projection")
    return params


# ---------------------------------------------------------------------------
# Classifier MLP (Sequential indices 0/1/4/5/8, /root/reference/nexar_arch.py:374-385)
# ---------------------------------------------------------------------------
def convert_classifier(sd: Dict) -> Tuple[Dict, Dict]:
    params: Dict = {"fc1": _linear(sd, "0"), "fc2": _linear(sd, "4"),
                    "fc_out": _linear(sd, "8")}
    stats: Dict = {}
    params["bn1"], stats["bn1"] = _bn1d(sd, "1")
    params["bn2"], stats["bn2"] = _bn1d(sd, "5")
    return params, stats


# ---------------------------------------------------------------------------
# Whole model
# ---------------------------------------------------------------------------
def derive_hyperparams(sd: Dict, hyperparams: Optional[Dict] = None) -> Dict:
    """Merge the checkpoint ``hyperparams`` contract with shape-derived facts
    from the state_dict (the state_dict wins where both speak)."""
    hp = dict(hyperparams or {})
    hp.setdefault("base_model", "convnext_tiny")

    head = _subdict(sd, "temporal_aggregation.")
    if "attention.in_proj_weight" in head:
        hp["temporal_mode"] = "attention"
        # nn.MultiheadAttention packs QKV, so the head count is NOT
        # shape-recoverable — the hyperparams contract is the only source
        # (/root/reference/nexar_arch.py:20,36-47). Validate what we can:
        # the embed dim must divide evenly, and a missing field means we
        # silently assume the reference default of 4, which yields wrong
        # softmax grouping (not a shape error) if the checkpoint was
        # trained with another value — warn loudly.
        d = _t(head["attention.in_proj_weight"]).shape[1]
        if "attention_heads" in hp:
            heads = int(hp["attention_heads"])
            if heads <= 0 or d % heads:
                raise ValueError(
                    f"checkpoint hyperparams claim attention_heads="
                    f"{heads}, but the attention embed dim is {d} "
                    f"(not divisible); the contract contradicts the "
                    f"state_dict shapes")
        else:
            import warnings

            warnings.warn(
                f"checkpoint hyperparams omit 'attention_heads'; assuming "
                f"the reference default of 4 "
                f"(/root/reference/nexar_arch.py:20). If this checkpoint "
                f"was trained with a different head count the logits will "
                f"be silently wrong — pass hyperparams explicitly. "
                f"(embed dim {d})",
                stacklevel=2)
            hp["attention_heads"] = 4
            if d % 4:
                raise ValueError(
                    f"attention embed dim {d} is not divisible by the "
                    f"assumed default of 4 heads; 'attention_heads' must "
                    f"be supplied in hyperparams")
    elif "conv_block.0.weight" in head:
        hp["temporal_mode"] = "convolution"
    elif "rnn.weight_ih_l0" in head:
        h = _t(head["rnn.weight_hh_l0"]).shape[1]
        ratio = _t(head["rnn.weight_ih_l0"]).shape[0] // h
        # the gate ratio (3=gru, 4=lstm, 1=rnn) uniquely identifies the cell;
        # shapes win over a possibly-stale hyperparams contract
        hp["temporal_mode"] = {3: "gru", 4: "lstm", 1: "rnn"}[ratio]
        hp["rnn_hidden_dim"] = h
        hp["rnn_num_layers"] = 1 + max(
            int(k.split("_l")[-1].split("_")[0]) for k in head
            if k.startswith("rnn.weight_ih_l"))
        hp["rnn_bidirectional"] = any(k.endswith("_reverse") for k in head)
    else:
        hp.setdefault("temporal_mode", "pooling")

    if "classifier.8.weight" in sd:
        hp["num_classes"] = int(_t(sd["classifier.8.weight"]).shape[0])
    hp.setdefault("num_classes", 3)
    return hp


def convert_reference_checkpoint(checkpoint: Dict) -> Tuple[Dict, Dict]:
    """Reference training checkpoint dict → (hyperparams, flax variables).

    Accepts either the full checkpoint (``model_state_dict`` +
    ``hyperparams`` keys, /root/reference/nexar_train.py:1622-1641) or a bare
    state_dict. Returns variables = {"params", "batch_stats"} for
    ``ReferenceVideoClassifier``.
    """
    if "model_state_dict" in checkpoint:
        sd = checkpoint["model_state_dict"]
        hp_in = checkpoint.get("hyperparams")
    else:
        sd, hp_in = checkpoint, None
    sd = {k: v for k, v in sd.items()}
    # DDP checkpoints may carry a 'module.' prefix; the reference unwraps
    # before save (/root/reference/distributed_video_classifier.py:1400-1401)
    # but be tolerant.
    if any(k.startswith("module.") for k in sd):
        sd = {k[len("module."):] if k.startswith("module.") else k: v
              for k, v in sd.items()}

    hp = derive_hyperparams(sd, hp_in)

    backbone_tree = convert_torch_state_dict(
        _subdict(sd, "backbone."), hp["base_model"])
    params: Dict = {"backbone": backbone_tree["params"]}
    stats: Dict = {}
    if backbone_tree["batch_stats"]:
        stats["backbone"] = backbone_tree["batch_stats"]

    head_sd = _subdict(sd, "temporal_aggregation.")
    mode = hp["temporal_mode"]
    if mode == "attention":
        params["temporal"] = convert_attention_head(head_sd)
    elif mode == "convolution":
        params["temporal"], stats["temporal"] = convert_conv_head(head_sd)
    elif mode in ("rnn", "lstm", "gru"):
        params["temporal"] = convert_rnn_head(
            head_sd, mode, hp["rnn_num_layers"], hp["rnn_bidirectional"])
    # pooling: no params

    cls_params, cls_stats = convert_classifier(_subdict(sd, "classifier."))
    params.update(cls_params)
    stats.update(cls_stats)
    return hp, {"params": params, "batch_stats": stats}


def import_checkpoint_file(pth_path: str, out_path: Optional[str] = None
                           ) -> Tuple[Dict, Dict]:
    """Offline CLI helper: torch .pth training checkpoint → (hyperparams,
    variables); optionally persisted as .npz + sidecar hyperparams for
    ``Predictor``-style loading."""
    import json

    import torch

    from vision_collision_detection_tpu.models.convert import save_npz

    ckpt = torch.load(pth_path, map_location="cpu", weights_only=False)
    hp, variables = convert_reference_checkpoint(ckpt)
    if out_path:
        save_npz(variables, out_path)
        with open(str(out_path) + ".hyperparams.json", "w") as f:
            json.dump(hp, f, indent=2)
    return hp, variables
