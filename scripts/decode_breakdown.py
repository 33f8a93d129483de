"""Per-clip decode cost breakdown: where do the host milliseconds go?

Answers the round-3 review question ("prove where the ~220 ms/clip goes")
with measurement instead of argument: the C library's stage profiler
(media/_src/vcd_media.cpp) accumulates ns over demux+libav decode, swscale
YUV→RGB, the torch-exact AA resize, and copy/pad, across the exact decode
work the e2e bench performs (32 fixture clips, stride-2 center sampling,
content-box letterbox — see bench.py).

Also measures the sparse-sampling leg: uniform 50-of-500 frames, where the
index-proven seek-ahead skips whole GOPs instead of decoding every
intermediate frame (the notebook-inference access pattern,
/root/reference/nexar_videos.py:422).

Third leg: sampling-aware decode on H.264 with disposable B-frames (real
dashcam streams; the mpeg4 bench fixtures are all-reference so the skip is
structurally inert there). The decoder marks packets outside the wanted
index set AVDISCARD_NONREF, dropping the macroblock decode of disposable
frames with bit-identical output (tests/test_media.py::TestBFrameStreams);
this leg A/Bs skip on/off on x264 fixtures to measure what that is worth.

CPU-only (no jax import). Writes DECODE_BREAKDOWN_r04.json at the repo root
and prints it.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CACHE_DIR, CLIP_FRAMES, FRAME_SIZE, SRC_H, SRC_W, ensure_fixtures
from vision_collision_detection_tpu.media.decoder import (
    decode_batch,
    decode_profile,
    encode_video,
    probe,
    profile_decode,
)
from vision_collision_detection_tpu.ops.letterbox import letterbox_geometry

TRIALS = 3
LONG_FRAMES = 500  # 50 s @ 10 fps: sparse-sampling / seek-ahead fixture


def _content_box():
    nh, nw, _, _ = letterbox_geometry(SRC_H, SRC_W, FRAME_SIZE)
    return (nh + nh % 2, nw + nw % 2)


def _ensure_long_video() -> str:
    path = os.path.join(CACHE_DIR, "long_clip_500.mp4")
    if os.path.exists(path):
        try:
            if probe(path).num_frames == LONG_FRAMES:
                return path
        except Exception:
            pass
    rng = np.random.default_rng(7)
    frames = np.zeros((LONG_FRAMES, SRC_H, SRC_W, 3), np.uint8)
    frames[:] = (40, 60, 50)
    for t in range(LONG_FRAMES):
        size = 80 + (t % 60) * 4
        y = max(0, min(SRC_H - size, (SRC_H - size) // 2 + int(40 * np.sin(t / 9))))
        x = max(0, min(SRC_W - size, (SRC_W - size) // 2 + int(60 * np.cos(t / 11))))
        frames[t, y:y + size, x:x + size] = (200, (t * 3) % 200, 60)
        noise = rng.integers(0, 30, size=(SRC_H // 8, SRC_W // 8, 3)).astype(np.int16)
        block = np.kron(noise, np.ones((8, 8, 1), np.int16))
        frames[t] = np.clip(frames[t].astype(np.int16) + block, 0, 255).astype(np.uint8)
    encode_video(path, frames, fps=10.0)
    return path


def profiled_decode(paths, indices, target, label, fast_resize=False):
    """Run the batch decode TRIALS times with stage profiling; median wall
    clock + the per-stage split of the LAST trial (stage ratios are stable
    across trials; wall uses the median)."""
    n = len(paths)
    decode_batch(paths, indices, target, fast_resize=fast_resize)  # warm
    walls = []
    for _ in range(TRIALS):
        profile_decode(True)
        t0 = time.perf_counter()
        decode_batch(paths, indices, target, fast_resize=fast_resize)
        walls.append(time.perf_counter() - t0)
        prof = decode_profile()
        profile_decode(False)
    wall = statistics.median(walls)
    staged = (prof["decode_s"] + prof["yuv_to_rgb_s"] + prof["resize_s"]
              + prof["copy_pad_s"] + prof["open_s"])
    out = {
        "clips": n,
        "wall_s": round(wall, 4),
        "clips_per_s": round(n / wall, 3),
        "per_clip_ms": {
            "demux_decode": round(prof["decode_s"] / n * 1e3, 2),
            "yuv_to_rgb": round(prof["yuv_to_rgb_s"] / n * 1e3, 2),
            "aa_resize": round(prof["resize_s"] / n * 1e3, 2),
            "copy_pad": round(prof["copy_pad_s"] / n * 1e3, 2),
            "open": round(prof["open_s"] / n * 1e3, 2),
            "unattributed": round((wall - staged) / n * 1e3, 2),
        },
        "frames_decoded": prof["frames_decoded"],
        "frames_converted": prof["frames_converted"],
        "seeks": prof["seeks"],
        "frames_skipped_by_seek": prof["frames_skipped_by_seek"],
        "frames_skipped_nonref": prof["frames_skipped_nonref"],
    }
    print(f"{label}: {out['clips_per_s']} clips/s, per-clip ms "
          f"{out['per_clip_ms']}", file=sys.stderr)
    return out


def _ensure_h264_fixtures(n: int = 8) -> list:
    """x264 siblings of the bench fixtures (same generated content): crf 23,
    gop 12, 2 B-frames — dashcam-representative stream structure. Small n:
    this leg measures a per-clip ratio, not throughput."""
    rng = np.random.default_rng(0)  # same stream as ensure_fixtures
    paths = []
    for i in range(n):
        p = os.path.join(CACHE_DIR, f"clip_h264_{i:03d}.mp4")
        paths.append(p)
        # keep the fixture RNG stream aligned with ensure_fixtures
        base = rng.integers(20, 100, size=3)
        if os.path.exists(p):
            try:
                if probe(p).num_frames == CLIP_FRAMES:
                    for t in range(CLIP_FRAMES):
                        rng.integers(0, 30, size=(SRC_H // 8, SRC_W // 8, 3))
                    continue
            except Exception:
                pass
        frames = np.zeros((CLIP_FRAMES, SRC_H, SRC_W, 3), np.uint8)
        frames[:] = base
        for t in range(CLIP_FRAMES):
            size = 80 + t * 8
            y = max(0, min(SRC_H - size,
                           (SRC_H - size) // 2 + int(40 * np.sin(t / 6))))
            x = max(0, min(SRC_W - size,
                           (SRC_W - size) // 2 + int(60 * np.cos(t / 8))))
            frames[t, y:y + size, x:x + size] = (200, 80 + i % 100, 60)
            noise = rng.integers(0, 30,
                                 size=(SRC_H // 8, SRC_W // 8, 3)).astype(np.int16)
            block = np.kron(noise, np.ones((8, 8, 1), np.int16))
            frames[t] = np.clip(frames[t].astype(np.int16) + block,
                                0, 255).astype(np.uint8)
        encode_video(p, frames, fps=10.0, codec="libx264", gop=12, bframes=2,
                     crf=23.0, preset="veryfast")
        print(f"encoded h264 fixture {i + 1}/{n}", file=sys.stderr)
    return paths


def main() -> None:
    paths = ensure_fixtures()
    content = _content_box()

    # Leg 1: the e2e bench's exact decode work (dense stride-2 sampling).
    idx = np.tile(np.arange(0, CLIP_FRAMES, 2, dtype=np.int64), (len(paths), 1))
    dense = profiled_decode(paths, idx, content, "dense stride-2")
    # Leg 1b: the same work on the planar-YUV fast resize (the round-4
    # headline pipeline) — the per-stage A/B behind bench.py's
    # fast_resize_speedup.
    dense_fast = profiled_decode(paths, idx, content,
                                 "dense stride-2 fast-resize",
                                 fast_resize=True)

    # Leg 2: sparse sampling on a long video — seek-ahead territory.
    long_path = _ensure_long_video()
    sparse_idx = np.linspace(0, LONG_FRAMES - 1, 50).astype(np.int64)[None]
    sparse = profiled_decode([long_path], sparse_idx, content,
                             "sparse 50-of-500")

    # Leg 3: H.264-with-B-frames A/B — sampling-aware non-ref skip on/off.
    from vision_collision_detection_tpu.media.decoder import set_skip_unneeded

    h264_paths = _ensure_h264_fixtures()
    h264_idx = np.tile(np.arange(0, CLIP_FRAMES, 2, dtype=np.int64),
                       (len(h264_paths), 1))
    # INTERLEAVED on/off trials: host speed drifts minute-to-minute on this
    # box (the dense leg has measured 112-208 ms/clip demux across runs), so
    # an A/B measured sequentially mostly measures the drift.
    decode_batch(h264_paths, h264_idx, content)  # warm
    on_walls, off_walls = [], []
    try:
        for _ in range(5):
            for skip, walls in ((True, on_walls), (False, off_walls)):
                set_skip_unneeded(skip)
                t0 = time.perf_counter()
                decode_batch(h264_paths, h264_idx, content)
                walls.append(time.perf_counter() - t0)
        set_skip_unneeded(True)
        profile_decode(True)
        decode_batch(h264_paths, h264_idx, content)
        prof_on = decode_profile()
        profile_decode(False)
    finally:
        set_skip_unneeded(True)
    n = len(h264_paths)
    on_cps = n / statistics.median(on_walls)
    off_cps = n / statistics.median(off_walls)
    h264 = {
        "clips": n,
        "skip_on_clips_per_s": round(on_cps, 3),
        "skip_off_clips_per_s": round(off_cps, 3),
        "skip_speedup": round(on_cps / off_cps, 3),
        "trials_interleaved": 5,
        "frames_decoded_skip_on": prof_on["frames_decoded"],
        "frames_skipped_nonref": prof_on["frames_skipped_nonref"],
        "frames_converted": prof_on["frames_converted"],
    }
    print(f"h264 stride-2 interleaved: on {on_cps:.3f} off {off_cps:.3f} "
          f"clips/s (speedup {on_cps / off_cps:.3f})", file=sys.stderr)

    result = {
        "dense_stride2_32x720p": dense,
        "dense_stride2_32x720p_fast_resize": dense_fast,
        "sparse_uniform_50of500_720p": sparse,
        "h264_bframes_stride2_8x720p": h264,
        "host_cores": os.cpu_count(),
        "note": (
            "per_clip_ms from the in-library stage profiler "
            "(vcd_profile_get); 'unattributed' = wall minus staged time "
            "(thread-pool scheduling + buffer allocation)."
        ),
    }
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "DECODE_BREAKDOWN_r04.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
