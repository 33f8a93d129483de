"""Batch inference API: checkpoint → per-clip collision probabilities.

Capability parity with ``VideoCollisionModel``
(/root/reference/nexar_inference.py:13-341) and the notebook
``NexarVideoInference`` (inference.ipynb cell 0):

- checkpoints are self-describing: the persisted ExperimentConfig drives
  architecture reconstruction (reference ``hyperparams`` contract,
  nexar_inference.py:55-81);
- ``predict`` accepts a single path, a list, or a directory (reference
  :124-157) — but needs no tempdir-symlink farm (:168-199): the dataset is
  path-based by design;
- ``predict_sliding`` runs batched sliding temporal windows over long videos
  (BASELINE.json config 2), all windows in one device batch;
- ``display_results`` renders the ANSI probability bars (:376-408).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from vision_collision_detection_tpu.ckpt.checkpoint import load_checkpoint
from vision_collision_detection_tpu.config import ExperimentConfig
from vision_collision_detection_tpu.data.datasets import ClipDataset, ClipRecord
from vision_collision_detection_tpu.data.loader import ClipLoader, device_prefetch
from vision_collision_detection_tpu.media.decoder import decode_frames, probe
from vision_collision_detection_tpu.models import build_model
from vision_collision_detection_tpu.ops.preprocess import eval_preprocess

VIDEO_EXTENSIONS = (".mp4", ".mov", ".MP4", ".MOV")


class CollisionPredictor:
    def __init__(self, cfg: ExperimentConfig, params, batch_stats=None,
                 model_override=None):
        """model_override: a ready flax module to use instead of
        build_model(cfg.model) — set by from_torch_checkpoint for imported
        reference architectures (models.reference_model)."""
        cfg.validate()
        self.cfg = cfg
        self._model_override = model_override
        self.model = model_override or build_model(cfg.model)
        self.params = params
        self.batch_stats = batch_stats or {}
        self.class_names = tuple(cfg.data.class_names)
        self._forward_cache = {}

    def _make_forward(self, folded_stride: bool):
        """jitted uint8 → probs. With folded_stride the dataset already
        decoded every k-th frame (k = model.frame_subsample), so the model's
        internal subsample is disabled — same math as the reference's
        load-50-drop-half (/root/reference/nexar_arch.py:412-415), at half
        the decode + host→device cost."""
        key = bool(folded_stride)
        if key in self._forward_cache:
            return self._forward_cache[key]
        import dataclasses

        mcfg = self.cfg.model
        if self._model_override is not None:
            model = self._model_override
            if folded_stride:  # flax modules are dataclasses
                model = dataclasses.replace(model, frame_subsample=1)
        else:
            if folded_stride:
                mcfg = dataclasses.replace(mcfg, frame_subsample=1)
            model = build_model(mcfg)
        aug = self.cfg.augment
        S = self.cfg.data.frame_size
        dtype = jnp.dtype(mcfg.dtype)

        @jax.jit
        def _forward(frames_u8):
            x = eval_preprocess(frames_u8, aug, S, dtype)
            logits = model.apply(
                {"params": self.params, "batch_stats": self.batch_stats},
                x, train=False,
            )
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        self._forward_cache[key] = _forward
        return _forward

    @property
    def _forward(self):
        return self._make_forward(False)

    def _make_sliding_forward(self):
        """jitted (unique_frames_u8 [U,S,S,3], win_idx [W,T]) → probs [W,C]:
        windows are gathered on-device from the unique-frame pool."""
        if "sliding" in self._forward_cache:
            return self._forward_cache["sliding"]
        mcfg = self.cfg.model
        model = (self._model_override if self._model_override is not None
                 else build_model(mcfg))
        aug = self.cfg.augment
        S = self.cfg.data.frame_size
        dtype = jnp.dtype(mcfg.dtype)

        @jax.jit
        def fn(unique_u8, idx):
            windows = jnp.take(unique_u8, idx, axis=0)  # [W, T, S, S, 3]
            x = eval_preprocess(windows, aug, S, dtype)
            logits = model.apply(
                {"params": self.params, "batch_stats": self.batch_stats},
                x, train=False,
            )
            return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        self._forward_cache["sliding"] = fn
        return fn

    def _sliding_forward(self, unique_u8: np.ndarray, win_idx: np.ndarray):
        """Pad U and W to buckets so different videos reuse the compile."""
        fn = self._make_sliding_forward()
        u, w = unique_u8.shape[0], win_idx.shape[0]
        u_pad = -(-u // 64) * 64
        w_pad = -(-w // 8) * 8
        if u_pad != u:
            unique_u8 = np.concatenate([
                unique_u8,
                np.zeros((u_pad - u,) + unique_u8.shape[1:], np.uint8),
            ])
        if w_pad != w:
            win_idx = np.concatenate([
                win_idx, np.zeros((w_pad - w, win_idx.shape[1]), np.int32)
            ])
        return fn(unique_u8, win_idx)[:w]

    def _fold_stride(self) -> int:
        m = self.cfg.model
        T = self.cfg.data.num_frames
        if m.frame_subsample > 1 and T > m.subsample_threshold:
            return m.frame_subsample
        return 1

    def _content_box(self, sample_path: str):
        """Rectangular decode canvas = letterbox content dims of this video:
        ship content rows only, pad black bars on-device."""
        from vision_collision_detection_tpu.ops.letterbox import (
            letterbox_geometry,
        )

        info = probe(sample_path)
        nh, nw, _, _ = letterbox_geometry(
            info.height, info.width, self.cfg.data.frame_size
        )
        # even dims keep layouts friendly; round up within the canvas
        return (min(nh + nh % 2, self.cfg.data.frame_size),
                min(nw + nw % 2, self.cfg.data.frame_size))

    def export_serving(self, out_dir: str, batch_sizes=(1, 8, 32),
                       content_box=None, platforms=None) -> dict:
        """AOT-export this predictor's serving forward into a
        ``ServingBundle`` directory (see ``infer/aot.py``): StableHLO with
        the weights embedded, reloadable without model code or re-tracing."""
        from vision_collision_detection_tpu.infer.aot import export_bundle

        return export_bundle(self, out_dir, batch_sizes=batch_sizes,
                             content_box=content_box, platforms=platforms)

    # ------------------------------------------------------------------
    @classmethod
    def from_checkpoint(cls, path: str) -> "CollisionPredictor":
        """`path` may be a checkpoint dir (best/last/epoch_N) or a run dir —
        run dirs resolve best→last→newest epoch (the reference's test-time
        fallback chain, /root/reference/nexar_complete.py:433-444)."""
        ckpt_dir = cls._resolve(path)
        arrays, meta = load_checkpoint(ckpt_dir)
        if "hyperparams" not in meta:
            raise ValueError(f"{ckpt_dir} has no hyperparams contract")
        cfg = ExperimentConfig.from_dict(meta["hyperparams"])
        return cls(cfg, arrays["params"], arrays.get("batch_stats") or {})

    @classmethod
    def from_torch_checkpoint(cls, path: str, dtype: str = "float32",
                              class_names=None) -> "CollisionPredictor":
        """Load a REFERENCE training checkpoint the way the reference's own
        inference does (/root/reference/nexar_inference.py:33-101): rebuild
        the architecture from the ``hyperparams`` contract and consume
        ``model_state_dict``. Accepts a torch ``.pth`` file (converted
        in-process; torch required) or the offline-converted ``.npz`` +
        ``.npz.hyperparams.json`` pair written by
        ``cli.convert_weights --full`` (torch-free)."""
        import json as _json

        import flax

        from vision_collision_detection_tpu.models.convert import load_npz
        from vision_collision_detection_tpu.models.reference_model import (
            build_reference_model,
        )

        if path.endswith(".npz"):
            variables = load_npz(path)
            with open(path + ".hyperparams.json") as f:
                hp = _json.load(f)
        else:
            import torch

            from vision_collision_detection_tpu.models.import_torch import (
                convert_reference_checkpoint,
            )

            ckpt = torch.load(path, map_location="cpu", weights_only=False)
            hp, variables = convert_reference_checkpoint(ckpt)

        model = build_reference_model(hp, dtype=jnp.dtype(dtype))
        overrides = {
            "model.backbone": model.backbone,
            "model.num_classes": model.num_classes,
            "data.num_classes": model.num_classes,
            "model.dtype": dtype,
        }
        # cfg's temporal vocabulary uses 'conv' (reference: 'convolution')
        mode = model.temporal_mode
        overrides["model.temporal_mode"] = "conv" if mode == "convolution" else mode
        if class_names:
            overrides["data.class_names"] = tuple(class_names)
        elif model.num_classes != 3:
            overrides["data.class_names"] = tuple(
                f"class_{i}" for i in range(model.num_classes)
            )
        cfg = ExperimentConfig().override(overrides)

        # Align the converted tree onto the model's init structure (dtype
        # canonicalization + missing-leaf detection).
        T, S = cfg.data.num_frames, cfg.data.frame_size
        init = jax.jit(lambda k, x: model.init(k, x, train=False))(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, T, S, S, 3), jnp.float32),
        )
        params = flax.serialization.from_state_dict(
            flax.core.unfreeze(init["params"]), variables["params"])
        batch_stats = flax.serialization.from_state_dict(
            flax.core.unfreeze(init.get("batch_stats", {})),
            variables.get("batch_stats") or {})
        return cls(cfg, params, batch_stats, model_override=model)

    @staticmethod
    def _resolve(path: str) -> str:
        from vision_collision_detection_tpu.ckpt.checkpoint import ARRAYS_DIR

        if os.path.isdir(os.path.join(path, ARRAYS_DIR)):
            return path
        from vision_collision_detection_tpu.ckpt import CheckpointStore

        store = CheckpointStore(path)
        role = store.latest_role()
        if role is None:
            raise FileNotFoundError(f"no checkpoint found under {path}")
        return store.path(role)

    # ------------------------------------------------------------------
    def _collect_paths(
        self, videos: Union[str, Sequence[str]]
    ) -> List[str]:
        if isinstance(videos, str):
            if os.path.isdir(videos):
                found = []
                for root, _, files in os.walk(videos):
                    for f in sorted(files):
                        if f.endswith(VIDEO_EXTENSIONS):
                            found.append(os.path.join(root, f))
                return found
            return [videos]
        return list(videos)

    def predict(
        self,
        videos: Union[str, Sequence[str]],
        sample_strategy: str = "center",
        batch_size: int = 8,
        event_times: Optional[Sequence[float]] = None,
        num_workers: int = 8,
    ) -> List[Dict]:
        """→ one result dict per clip (reference :304-311)."""
        paths = self._collect_paths(videos)
        if not paths:
            return []
        records = [
            ClipRecord(
                video_id=os.path.splitext(os.path.basename(p))[0],
                video_path=p, label=0,
                event_time_sec=(event_times[i] if event_times else None),
            )
            for i, p in enumerate(paths)
        ]
        dc = self.cfg.data
        stride = self._fold_stride()
        try:
            content_box = self._content_box(paths[0])
        except Exception:
            content_box = None
        ds = ClipDataset(
            records, fps=dc.fps, duration=dc.duration,
            frame_size=dc.frame_size, sample_strategy=sample_strategy,
            class_names=self.class_names, frame_stride=stride,
            content_box=content_box, fast_resize=dc.fast_resize,
            lowres_decode=dc.lowres_decode,
        )
        loader = ClipLoader(ds, batch_size, num_workers=num_workers)
        forward = self._make_forward(stride > 1)
        path_by_id = {r.video_id: r.video_path for r in records}
        results: List[Dict] = []
        for batch in device_prefetch(iter(loader), keys=("frames",)):
            probs = np.asarray(forward(batch["frames"]))
            for i in range(len(batch["id"])):
                if batch["error"][i]:
                    results.append({
                        "video_path": path_by_id.get(batch["id"][i]),
                        "id": batch["id"][i],
                        "success": False,
                        "error": "decode failed",
                    })
                    continue
                p = probs[i]
                k = int(p.argmax())
                results.append({
                    "video_path": path_by_id.get(batch["id"][i]),
                    "id": batch["id"][i],
                    "success": True,
                    "predicted_class": self.class_names[k],
                    "predicted_label": k,
                    "confidence": float(p[k]),
                    "probabilities": {
                        name: float(p[j])
                        for j, name in enumerate(self.class_names)
                    },
                })
        return results

    # ------------------------------------------------------------------
    def evaluate(
        self,
        metadata_df,
        *,
        video_path_column: str = "video_path",
        label_column: str = "video_type",
        sample_strategy: str = "center",
        batch_size: int = 8,
        confusion_matrix_path: str = "",
    ) -> dict:
        """Predict a labeled set and score it — the notebook's
        eval-vs-ground-truth cells (inference.ipynb cells 14-17): accuracy,
        per-class P/R/F1, weighted OvR AUC, confusion matrix (optionally
        rendered to PNG)."""
        import numpy as np

        from vision_collision_detection_tpu.metrics import (
            classification_metrics,
        )

        name_to_idx = {n: i for i, n in enumerate(self.class_names)}
        paths = metadata_df[video_path_column].tolist()
        labels = [
            name_to_idx[l] if not isinstance(l, (int, np.integer)) else int(l)
            for l in metadata_df[label_column]
        ]
        results = self.predict(paths, sample_strategy=sample_strategy,
                               batch_size=batch_size)
        ok = [i for i, r in enumerate(results) if r.get("success")]
        y_true = np.asarray([labels[i] for i in ok])
        y_pred = np.asarray([results[i]["predicted_label"] for i in ok])
        probs = np.asarray([
            [results[i]["probabilities"][n] for n in self.class_names]
            for i in ok
        ])
        metrics = classification_metrics(
            y_true, y_pred, probs, len(self.class_names), self.class_names
        )
        metrics["num_failed"] = len(results) - len(ok)
        if confusion_matrix_path:
            from vision_collision_detection_tpu.obs.plots import (
                plot_confusion_matrix,
            )

            plot_confusion_matrix(
                metrics["confusion_matrix"], self.class_names,
                confusion_matrix_path,
            )
        return metrics

    # ------------------------------------------------------------------
    def predict_sliding(
        self,
        video_path: str,
        stride_sec: float = 1.0,
        max_windows: int = 64,
    ) -> List[Dict]:
        """Sliding-window inference over one long video: every window is a
        row of ONE batched forward pass (BASELINE.json config 2)."""
        info = probe(video_path)
        dc = self.cfg.data
        T = dc.num_frames
        window_len_sec = dc.duration
        stride_frames = max(1, int(round(stride_sec * info.fps)))
        native_per_window = int(round(window_len_sec * info.fps))

        starts = list(range(
            0, max(1, info.num_frames - native_per_window + 1), stride_frames
        ))[:max_windows]
        # each window: T frames sampled uniformly inside the native window
        all_indices = []
        for s in starts:
            idx = np.linspace(
                s, min(s + native_per_window - 1, info.num_frames - 1), T
            ).astype(np.int64)
            all_indices.append(idx)
        flat = np.unique(np.concatenate(all_indices))
        decoded = decode_frames(
            video_path, flat, target_size=dc.frame_size, letterbox=True,
            fast_resize=dc.fast_resize,
            lowres=dc.lowres_decode,
        )
        pos = {int(f): i for i, f in enumerate(flat)}
        win_idx = np.asarray([[pos[int(i)] for i in idx]
                              for idx in all_indices], np.int32)  # [W, T]

        # Ship unique frames ONCE and build windows on-device: overlapping
        # windows duplicate every frame ~window/stride times (5x at the
        # defaults), so host→device transfer drops by the same factor and
        # the window assembly becomes one HBM row-gather instead of a numpy
        # stack. Shapes are bucketed so repeated calls hit the jit cache.
        probs = np.asarray(self._sliding_forward(decoded, win_idx))
        out = []
        for w, (s, p) in enumerate(zip(starts, probs)):
            k = int(p.argmax())
            out.append({
                "window": w,
                "start_sec": s / info.fps,
                "end_sec": min((s + native_per_window) / info.fps,
                               info.duration),
                "predicted_class": self.class_names[k],
                "confidence": float(p[k]),
                "probabilities": {
                    name: float(p[j]) for j, name in enumerate(self.class_names)
                },
            })
        return out

    # ------------------------------------------------------------------
    @staticmethod
    def display_results_widget(results: List[Dict]):
        """Notebook browsing mode: matplotlib result cards behind an
        ipywidgets clip selector (the reference's fancy widget,
        /root/reference/nexar_inference.py:410-504). Degrades to
        sequential cards without ipywidgets; use ``display_results`` for
        terminal ANSI bars."""
        from vision_collision_detection_tpu.obs.viz import browse_results

        return browse_results(results)

    @staticmethod
    def display_results(results: List[Dict], width: int = 40) -> str:
        """ANSI bar chart per clip (reference :376-408); returns the text."""
        lines = []
        for r in results:
            name = r.get("id") or os.path.basename(r.get("video_path", "?"))
            if not r.get("success", True):
                lines.append(f"{name}: ERROR ({r.get('error')})")
                continue
            lines.append(f"{name}: {r['predicted_class']} "
                         f"({r['confidence'] * 100:.1f}%)")
            for cls, p in r["probabilities"].items():
                bar = "█" * int(p * width)
                lines.append(f"  {cls:<15} {bar:<{width}} {p * 100:5.1f}%")
        text = "\n".join(lines)
        print(text)
        return text
