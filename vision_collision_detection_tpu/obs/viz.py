"""Clip preview export + attention visualization.

Parity with the reference's media artifacts:
- ``show_batch``-style preview export (/root/reference/nexar_videos.py:
  498-820): denormalize a batch, write per-clip preview MP4s (our C++
  encoder replaces imageio/ffmpeg), and an HTML grid page with
  base64-embedded videos.
- attention visualization (/root/reference/nexar_arch.py:513-603 +
  nexar_train.py:1888-1972): per-frame temporal-attention weights from the
  attention head, rendered as a brightness/bar overlay video plus a
  matplotlib heatmap.
"""

from __future__ import annotations

import base64
import html as html_mod
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from vision_collision_detection_tpu.media.decoder import encode_video


def denormalize_frames(frames: np.ndarray, mean, std) -> np.ndarray:
    """normalized float [..., H, W, 3] → uint8."""
    x = np.asarray(frames, np.float32)
    x = x * np.asarray(std, np.float32) + np.asarray(mean, np.float32)
    return np.clip(x * 255.0, 0, 255).astype(np.uint8)


def export_batch_preview(
    batch: Dict,
    out_dir: str,
    fps: float = 10.0,
    max_clips: int = 8,
    mean=(0.45,) * 3,
    std=(0.225,) * 3,
    html_name: str = "batch_preview.html",
) -> str:
    """Write per-clip MP4s + an HTML grid page; returns the HTML path."""
    os.makedirs(out_dir, exist_ok=True)
    frames = np.asarray(batch["frames"])
    n = min(frames.shape[0], max_clips)
    cells = []
    for i in range(n):
        clip = frames[i]
        if clip.dtype != np.uint8:
            clip = denormalize_frames(clip, mean, std)
        h, w = clip.shape[1:3]
        if h % 2 or w % 2:  # yuv420 needs even dims
            clip = clip[:, : h - h % 2, : w - w % 2]
        vid = batch.get("id", [f"clip{i}"] * n)[i]
        path = os.path.join(out_dir, f"preview_{i}_{vid}.mp4")
        encode_video(path, clip, fps=fps)
        with open(path, "rb") as f:
            b64 = base64.b64encode(f.read()).decode()
        label = ""
        if "target" in batch:
            label = f"target={int(np.asarray(batch['target'])[i])}"
        cells.append(
            f"<div class='cell'><video controls loop muted autoplay "
            f"src='data:video/mp4;base64,{b64}' width='240'></video>"
            f"<div>{html_mod.escape(str(vid))} {label}</div></div>"
        )
    doc = (
        "<html><head><style>body{font-family:monospace;background:#181818;"
        "color:#ddd}.grid{display:flex;flex-wrap:wrap;gap:12px}"
        ".cell{text-align:center}</style></head><body>"
        f"<h3>batch preview ({n} clips)</h3><div class='grid'>"
        + "".join(cells) + "</div></body></html>"
    )
    html_path = os.path.join(out_dir, html_name)
    with open(html_path, "w") as f:
        f.write(doc)
    return html_path


def extract_attention_weights(model, variables, frames, per_frame: bool = True):
    """Run a forward pass capturing the temporal-attention matrix.

    → (logits, attn [B, H, T, T]) or per-frame importance [B, T] (mean
    attention received over heads and query positions) when per_frame.
    """
    logits, inter = model.apply(
        variables, frames, train=False, mutable=["intermediates"]
    )
    flat = _find_sown(inter.get("intermediates", {}), "attention_weights")
    if flat is None:
        raise ValueError(
            "model has no attention head (temporal_mode='attention' required)"
        )
    attn = np.asarray(flat[0], np.float32)
    if not per_frame:
        return logits, attn
    return logits, attn.mean(axis=(1, 2))  # [B, T]


def _find_sown(tree, name):
    if isinstance(tree, dict):
        if name in tree:
            return tree[name]
        for v in tree.values():
            found = _find_sown(v, name)
            if found is not None:
                return found
    return None


def render_attention_overlay(
    frames_u8: np.ndarray,
    weights: np.ndarray,
    out_path: str,
    fps: float = 10.0,
    bar_height: int = 8,
) -> str:
    """Overlay per-frame attention onto a clip and write an MP4.

    Each frame gets (a) brightness scaled toward its attention weight and
    (b) a bottom bar whose filled width shows the weight (reference's
    overlay-video export, nexar_arch.py:569-600).
    """
    frames = np.asarray(frames_u8)
    t = frames.shape[0]
    w_norm = np.asarray(weights, np.float32)
    w_norm = (w_norm - w_norm.min()) / max(
        float(w_norm.max() - w_norm.min()), 1e-8
    )
    out = frames.astype(np.float32).copy()
    for i in range(t):
        out[i] *= 0.4 + 0.6 * w_norm[i]
        fill = int(w_norm[i] * frames.shape[2])
        out[i, -bar_height:, :fill] = (255, 64, 64)
    out = np.clip(out, 0, 255).astype(np.uint8)
    h, w = out.shape[1:3]
    out = out[:, : h - h % 2, : w - w % 2]
    encode_video(out_path, out, fps=fps)
    return out_path


def plot_attention_heatmap(attn: np.ndarray, out_path: str,
                           clip_index: int = 0) -> str:
    """[B, H, T, T] attention → per-head heatmap PNG
    (reference nexar_train.py:1888-1972)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    a = np.asarray(attn)[clip_index]  # [H, T, T]
    n_heads = a.shape[0]
    fig, axes = plt.subplots(1, n_heads, figsize=(3.2 * n_heads, 3))
    if n_heads == 1:
        axes = [axes]
    for h, ax in enumerate(axes):
        im = ax.imshow(a[h], cmap="viridis")
        ax.set_title(f"head {h}")
        ax.set_xlabel("key frame")
        if h == 0:
            ax.set_ylabel("query frame")
    fig.colorbar(im, ax=axes[-1] if n_heads > 1 else axes[0])
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


# ---------------------------------------------------------------------------
# Interactive results browsing (notebook): matplotlib result cards + an
# ipywidgets clip selector — the reference's fancy widget
# (/root/reference/nexar_inference.py:410-504). Falls back cleanly when
# matplotlib / ipywidgets are unavailable (headless hosts keep the ANSI
# bars from infer.CollisionPredictor.display_results).
# ---------------------------------------------------------------------------

_CLASS_COLORS = {
    "Normal": "#4CAF50",
    "Near Collision": "#FF9800",
    "Collision": "#F44336",
}


def render_result_card(result: Dict, ax=None, show: bool = False):
    """One matplotlib 'analysis card' for a prediction result dict
    (the reference's probability-bar figure, nexar_inference.py:434-504).

    Returns the matplotlib Figure (caller may save or display it)."""
    import matplotlib

    if not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import patches

    if ax is None:
        fig, ax = plt.subplots(figsize=(8, 4.5))
    else:
        fig = ax.figure
    ax.set_facecolor("#F5F5F5")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.axis("off")

    if not result.get("success", True):
        ax.text(0.5, 0.5, f"ERROR: {result.get('error', 'unknown')}",
                ha="center", fontsize=13, color="#F44336")
        return fig

    ax.text(0.5, 0.9, "Video Analysis Results", ha="center",
            fontsize=15, fontweight="bold")
    pred = result["predicted_class"]
    ax.text(0.5, 0.8, f"Predicted: {pred}", ha="center", fontsize=13,
            fontweight="bold", color=_CLASS_COLORS.get(pred, "#333333"))

    ranked = sorted(result["probabilities"].items(), key=lambda kv: -kv[1])
    y = 0.64
    for cls, p in ranked:
        color = _CLASS_COLORS.get(cls, "#999999")
        ax.add_patch(patches.Rectangle((0.22, y - 0.04), 0.6, 0.08,
                                       facecolor="#E0E0E0", alpha=0.5))
        ax.add_patch(patches.Rectangle((0.22, y - 0.04),
                                       max(0.01, p * 0.6), 0.08,
                                       facecolor=color))
        ax.text(0.20, y, cls, ha="right", va="center", fontsize=10,
                fontweight="bold")
        ax.text(0.84, y, f"{p * 100:.1f}%", ha="left", va="center",
                fontsize=10)
        y -= 0.14

    meta = []
    if result.get("video_path"):
        meta.append(f"File: {os.path.basename(result['video_path'])}")
    if result.get("id"):
        meta.append(f"id: {result['id']}")
    if meta:
        ax.text(0.5, 0.08, " | ".join(meta), ha="center", fontsize=8,
                color="#666666")
    return fig


def browse_results(results: List[Dict]):
    """Interactive notebook browser over prediction results: an ipywidgets
    dropdown selects the clip, the card re-renders on change (the
    reference's Jupyter browsing mode). Outside a notebook (or without
    ipywidgets) renders every card sequentially instead.

    Returns the widget container, or the list of figures in fallback
    mode."""
    try:
        import ipywidgets as widgets
        from IPython.display import display
    except ImportError:
        return [render_result_card(r, show=True) for r in results]

    import matplotlib.pyplot as plt

    names = [
        r.get("id") or os.path.basename(r.get("video_path", f"clip {i}"))
        for i, r in enumerate(results)
    ]
    dd = widgets.Dropdown(options=list(zip(names, range(len(results)))),
                          description="clip")
    out = widgets.Output()

    def _render(idx: int) -> None:
        with out:
            out.clear_output(wait=True)
            fig = render_result_card(results[idx], show=True)
            display(fig)
            plt.close(fig)

    dd.observe(lambda ch: _render(ch["new"]), names="value")
    box = widgets.VBox([dd, out])
    display(box)
    _render(0)
    return box
