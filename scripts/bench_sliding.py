"""Sliding-window long-video inference benchmark (BASELINE.json config 2).

Synthesizes a long dashcam-style video, then times
``CollisionPredictor.predict_sliding`` end-to-end on the chip: windows/sec,
the decode/forward stage split, and the window count. The reference's
long-video behavior is the notebook inference path (uniform sampling over a
window, /root/reference/inference.ipynb cell 0); here every window is a row
of one batched forward pass.

Run on the chip: python scripts/bench_sliding.py
Writes SLIDING_r03.json at the repo root.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_long_video(path: str, seconds: int, fps: int, h=720, w=1280) -> str:
    """Chunked synthesis through the streaming VideoWriter — a 5-minute
    720p video would need ~8 GB as a single array."""
    from vision_collision_detection_tpu.media.decoder import VideoWriter, probe

    n = seconds * fps
    if os.path.exists(path):
        try:
            if probe(path).num_frames >= n:
                return path
        except Exception:
            pass
    rng = np.random.default_rng(7)
    base = rng.integers(20, 90, size=3)
    with VideoWriter(path, w=w, h=h, fps=float(fps)) as vw:
        chunk = np.zeros((1, h, w, 3), np.uint8)
        for t in range(n):
            chunk[0] = base
            size = 60 + (t * 5) % 400
            y = max(0, min(h - size,
                           (h - size) // 2 + int(50 * np.sin(t / 9))))
            x = max(0, min(w - size,
                           (w - size) // 2 + int(90 * np.cos(t / 13))))
            chunk[0, y:y + size, x:x + size] = (190, (t * 3) % 255, 70)
            # accumulate in int16: uint8 += would wrap near-255 pixels into
            # speckle artifacts (ADVICE r3)
            noise = rng.integers(0, 25,
                                 size=(h // 8, w // 8, 3)).astype(np.int16)
            block = np.kron(noise, np.ones((8, 8, 1), np.int16))
            chunk[0] = np.clip(chunk[0].astype(np.int16) + block,
                               0, 255).astype(np.uint8)
            vw.append(chunk)
    return path


def bench_one(pred, cfg, video, seconds, fps, stride_sec, max_windows,
              trials) -> dict:
    """One video-length row: windows/s, decode share, unique-frame count —
    the amortization evidence (longer videos reuse decoded frames across
    overlapping windows; round-4 review asked whether windows/s holds at
    5 minutes)."""
    import jax

    from vision_collision_detection_tpu.media.decoder import decode_frames, probe

    info = probe(video)
    log(f"video: {info.num_frames} frames @ {info.fps} fps "
        f"({info.duration:.0f}s {info.width}x{info.height})")

    # warmup (compile the batched forward at this window-count bucket)
    t0 = time.perf_counter()
    rows = pred.predict_sliding(video, stride_sec=stride_sec,
                                max_windows=max_windows)
    warm_s = time.perf_counter() - t0
    n_windows = len(rows)
    log(f"warmup: {n_windows} windows in {warm_s:.1f}s (incl. compile)")

    # decode-only stage split: the unique-frame decode predict_sliding does
    T = cfg.data.num_frames
    native_per_window = int(round(cfg.data.duration * info.fps))
    stride_frames = max(1, int(round(stride_sec * info.fps)))
    starts = list(range(
        0, max(1, info.num_frames - native_per_window + 1), stride_frames
    ))[:max_windows]
    flat = np.unique(np.concatenate([
        np.linspace(s, min(s + native_per_window - 1, info.num_frames - 1),
                    T).astype(np.int64) for s in starts
    ]))
    t0 = time.perf_counter()
    decode_frames(video, flat, target_size=cfg.data.frame_size, letterbox=True)
    decode_s = time.perf_counter() - t0
    log(f"decode-only: {len(flat)} unique frames in {decode_s:.2f}s")

    rates, e2e_secs = [], []
    for trial in range(trials):
        t0 = time.perf_counter()
        rows = pred.predict_sliding(video, stride_sec=stride_sec,
                                    max_windows=max_windows)
        dt = time.perf_counter() - t0
        rates.append(len(rows) / dt)
        e2e_secs.append(dt)
        log(f"trial {trial}: {rates[-1]:.2f} windows/s ({dt:.2f}s e2e)")

    covered = (min(starts[-1] + native_per_window, info.num_frames)
               / info.fps if starts else 0.0)
    return {
        "video": {"seconds": seconds, "fps": fps,
                  "resolution": f"{info.width}x{info.height}"},
        "stride_sec": stride_sec,
        "n_windows": n_windows,
        "video_seconds_covered": round(covered, 1),
        "unique_frames_decoded": int(len(flat)),
        "frames_per_window_amortized": round(len(flat) / max(1, n_windows), 1),
        "windows_per_s": round(statistics.median(rates), 3),
        "trials": [round(r, 3) for r in rates],
        "e2e_sec_median": round(statistics.median(e2e_secs), 2),
        "decode_only_sec": round(decode_s, 2),
        "decode_share": round(decode_s / statistics.median(e2e_secs), 3),
        "device_kind": jax.devices()[0].device_kind,
        "realtime_factor": round(covered / statistics.median(e2e_secs), 1),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=int, nargs="+", default=[60, 300])
    ap.add_argument("--fps", type=int, default=10)
    ap.add_argument("--stride-sec", type=float, default=1.0)
    ap.add_argument("--max-windows", type=int, nargs="+", default=[64, 128])
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--output", default=os.path.join(REPO, "SLIDING_r04.json"))
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".bench_cache", "xla"))

    from vision_collision_detection_tpu.config import ExperimentConfig
    from vision_collision_detection_tpu.infer import CollisionPredictor
    from vision_collision_detection_tpu.models import build_model

    # flagship architecture with seeded weights (throughput is
    # weight-independent)
    cfg = ExperimentConfig()
    model = build_model(cfg.model)
    import jax.numpy as jnp
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, cfg.data.num_frames, cfg.data.frame_size,
                   cfg.data.frame_size, 3), jnp.float32))
    pred = CollisionPredictor(
        cfg, variables["params"], variables.get("batch_stats", {}))

    rows = []
    caps = (args.max_windows if len(args.max_windows) == len(args.seconds)
            else [args.max_windows[-1]] * len(args.seconds))
    for seconds, cap in zip(args.seconds, caps):
        video = make_long_video(
            os.path.join(REPO, ".bench_cache", f"long_video_{seconds}s.mp4"),
            seconds, args.fps)
        rows.append(bench_one(pred, cfg, video, seconds, args.fps,
                              args.stride_sec, cap, args.trials))

    out = {
        "model": f"{cfg.model.backbone}+{cfg.model.temporal_mode}",
        "rows": rows,
    }
    with open(args.output, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
