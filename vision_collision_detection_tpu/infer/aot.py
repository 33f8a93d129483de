"""AOT-exported serving bundles: trace/lower once, serve from the artifact.

A TPU-native capability beyond the reference, which reconstructs the torch
module from its ``hyperparams`` contract at every cold start and re-traces
on the first batch (/root/reference/nexar_inference.py:55-101). Here the
jitted uint8→probs forward (preprocess + backbone + temporal head +
softmax, the exact program ``CollisionPredictor`` serves) is captured with
``jax.export`` into a versioned StableHLO artifact with the parameters
embedded as constants. A serving host deserializes and runs it with **no
model code, no flax, no checkpoint restore, and no re-tracing** — just
``jax`` and the bundle — and XLA's persistent compilation cache makes the
remaining backend compile a one-time cost per host.

Bundle layout (a directory)::

    manifest.json          # format version, shapes, buckets, platforms,
                           # class names, hyperparams provenance
    fwd_b{B}.stablehlo     # one serialized Exported per batch bucket

Batching: requests are padded up to the smallest bucket and sliced back;
oversize requests are chunked through the largest bucket, so any request
size is served by a fixed set of compiled programs (the same bucketing
discipline as ``CollisionPredictor._sliding_forward``).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

FORMAT_VERSION = 1
MANIFEST = "manifest.json"


def _forward_shape(cfg, content_box: Optional[Tuple[int, int]]):
    """[T, H, W, 3] uint8 input shape of the serving forward: folded-stride
    frame count (data/datasets.py frames_per_clip) over the full letterbox
    canvas, or content rows only when a content box is pinned."""
    m, d = cfg.model, cfg.data
    stride = (m.frame_subsample
              if m.frame_subsample > 1 and d.num_frames > m.subsample_threshold
              else 1)
    T = -(-d.num_frames // stride)
    h, w = content_box if content_box else (d.frame_size, d.frame_size)
    return (T, int(h), int(w), 3), stride


def export_bundle(
    predictor,
    out_dir: str,
    batch_sizes: Sequence[int] = (1, 8, 32),
    content_box: Optional[Tuple[int, int]] = None,
    platforms: Optional[Sequence[str]] = None,
) -> dict:
    """Export ``predictor``'s serving forward into ``out_dir``.

    Default buckets include 32: the round-5 eval-batch sweep
    (PROFILE_r05.json) measured 167 / 195.5 / 203.5 device clips/s at
    B=16/32/64 on the flagship — device-bound serving should batch ≥32
    (the marginal win from 64 is 4% for 2x the latency; 32 is the
    default sweet spot).

    platforms: lowering targets (e.g. ``("tpu", "cpu")``); defaults to the
    current default backend, so a CPU dev box can cross-export for TPU
    serving hosts by passing ``("tpu",)`` explicitly.
    """
    import jax
    import jax.export

    (T, H, W, C), stride = _forward_shape(predictor.cfg, content_box)
    forward = predictor._make_forward(stride > 1)
    buckets = sorted(set(int(b) for b in batch_sizes))
    if not buckets or buckets[0] < 1:
        raise ValueError(f"batch_sizes must be positive, got {batch_sizes}")

    os.makedirs(out_dir, exist_ok=True)
    kwargs = {"platforms": tuple(platforms)} if platforms else {}
    for B in buckets:
        spec = jax.ShapeDtypeStruct((B, T, H, W, C), jax.numpy.uint8)
        exported = jax.export.export(forward, **kwargs)(spec)
        with open(os.path.join(out_dir, f"fwd_b{B}.stablehlo"), "wb") as f:
            f.write(exported.serialize())

    manifest = {
        "format_version": FORMAT_VERSION,
        "jax_version": jax.__version__,
        "platforms": list(platforms) if platforms
        else [jax.default_backend()],
        "buckets": buckets,
        "frame_shape": [T, H, W, C],
        "folded_stride": stride,
        "input_dtype": "uint8",
        "class_names": list(predictor.class_names),
        "hyperparams": predictor.cfg.to_dict(),
    }
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


class ServingBundle:
    """Load an exported bundle and serve uint8 clips → class probabilities.

    Needs only ``jax`` + ``numpy`` at runtime (deserialization rebuilds the
    program from StableHLO; parameters are constants inside it). Each
    bucket's program is wrapped in ``jax.jit`` so repeated calls reuse the
    compiled executable and the persistent compilation cache applies.
    """

    def __init__(self, path: str):
        import jax
        import jax.export

        with open(os.path.join(path, MANIFEST)) as f:
            self.manifest = json.load(f)
        if self.manifest["format_version"] > FORMAT_VERSION:
            raise ValueError(
                f"bundle format {self.manifest['format_version']} is newer "
                f"than this runtime ({FORMAT_VERSION})")
        backend = jax.default_backend()
        if backend not in self.manifest["platforms"]:
            raise ValueError(
                f"bundle was exported for {self.manifest['platforms']}, "
                f"current backend is {backend!r}")
        self.class_names = tuple(self.manifest["class_names"])
        self.frame_shape = tuple(self.manifest["frame_shape"])
        self.buckets: List[int] = sorted(self.manifest["buckets"])
        self._fns = {}
        for B in self.buckets:
            with open(os.path.join(path, f"fwd_b{B}.stablehlo"), "rb") as f:
                exported = jax.export.deserialize(bytearray(f.read()))
            self._fns[B] = jax.jit(exported.call)

    def predict_probs(self, frames_u8: np.ndarray) -> np.ndarray:
        """[B, T, H, W, 3] uint8 → [B, num_classes] float32 probabilities."""
        frames_u8 = np.asarray(frames_u8)
        if frames_u8.shape[1:] != self.frame_shape:
            raise ValueError(
                f"expected per-clip shape {self.frame_shape}, "
                f"got {frames_u8.shape[1:]}")
        n = frames_u8.shape[0]
        out = []
        i = 0
        while i < n:
            remaining = n - i
            bucket = next((b for b in self.buckets if b >= remaining),
                          self.buckets[-1])
            take = min(remaining, bucket)
            chunk = frames_u8[i:i + take]
            if take < bucket:
                chunk = np.concatenate([
                    chunk,
                    np.zeros((bucket - take,) + self.frame_shape, np.uint8),
                ])
            out.append(np.asarray(self._fns[bucket](chunk))[:take])
            i += take
        return np.concatenate(out) if out else np.zeros(
            (0, len(self.class_names)), np.float32)

    def predict(self, frames_u8: np.ndarray) -> List[Dict]:
        """Result dicts in the ``CollisionPredictor.predict`` schema for
        pre-decoded clips (decode stays the caller's concern — the bundle
        is the device half of the pipeline)."""
        probs = self.predict_probs(frames_u8)
        results = []
        for p in probs:
            k = int(p.argmax())
            results.append({
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
