"""End-to-end throughput benchmark: clips/sec/chip, decode → inference.

Measures the BASELINE.json north-star metric on the flagship config
(convnext_tiny + GRU, 50→25 frames @ 224², the reference CLI default):
C++ FFmpeg threaded decode (host) → uint8 batches → ONE jitted XLA program
(letterbox + normalize + backbone + temporal head + softmax) on the TPU.

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
baseline is a faithful reference-STYLE pipeline measured on the SAME
hardware: per-frame CPU transform loop (frame-by-frame PIL resize + numpy
normalize, mirroring nexar_video_aug.py's per-frame torchvision loops at
/root/reference/nexar_video_aug.py:723-736) feeding unbatched (B=1) device
forwards — i.e., the reference's pipeline shape with only the math library
swapped. The ratio isolates the TPU-first design wins: fused batched
preprocessing, uint8 host→device transfer, and batched MXU inference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Diagnostics go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
NUM_CLIPS = 32
CLIP_FRAMES = 50
CLIP_FPS = 10
SRC_H, SRC_W = 720, 1280  # dashcam-typical 720p
FRAME_SIZE = 224
BATCH = 16
PASSES = 4
BASELINE_CLIPS = 6


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def ensure_fixtures() -> list:
    from vision_collision_detection_tpu.media.decoder import encode_video, probe

    os.makedirs(CACHE_DIR, exist_ok=True)
    paths = [os.path.join(CACHE_DIR, f"clip_{i:03d}.mp4") for i in range(NUM_CLIPS)]
    rng = np.random.default_rng(0)
    for i, p in enumerate(paths):
        if os.path.exists(p):
            try:
                if probe(p).num_frames == CLIP_FRAMES:
                    continue
            except Exception:
                pass
        frames = np.zeros((CLIP_FRAMES, SRC_H, SRC_W, 3), np.uint8)
        base = rng.integers(20, 100, size=3)
        frames[:] = base
        for t in range(CLIP_FRAMES):
            size = 80 + t * 8
            y = (SRC_H - size) // 2 + int(40 * np.sin(t / 6))
            x = (SRC_W - size) // 2 + int(60 * np.cos(t / 8))
            y = max(0, min(SRC_H - size, y))
            x = max(0, min(SRC_W - size, x))
            frames[t, y:y + size, x:x + size] = (200, 80 + i % 100, 60)
            # block noise so the codec can't trivially skip macroblocks
            noise = rng.integers(0, 30, size=(SRC_H // 8, SRC_W // 8, 3),
                                 dtype=np.uint8)
            frames[t] += np.kron(noise, np.ones((8, 8, 1), np.uint8))
        encode_video(p, frames, fps=CLIP_FPS)
        log(f"encoded fixture {i + 1}/{NUM_CLIPS}")
    return paths


def build_forward():
    import dataclasses

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", os.path.join(CACHE_DIR, "xla"))

    from vision_collision_detection_tpu.config import ExperimentConfig
    from vision_collision_detection_tpu.models import build_model
    from vision_collision_detection_tpu.ops.preprocess import eval_preprocess

    cfg = ExperimentConfig()  # convnext_tiny + gru flagship
    # The pipeline folds the model's ::2 frame subsample into decode (same
    # math as /root/reference/nexar_arch.py:412-415 at half the decode and
    # host→device bytes), so the device model skips its internal subsample.
    model = build_model(dataclasses.replace(cfg.model, frame_subsample=1))
    T = cfg.data.num_frames // 2
    # jit the init: eager init dispatches hundreds of tiny ops, which is
    # pathological through this machine's remote-compile TPU tunnel
    t0 = time.perf_counter()
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, T, FRAME_SIZE, FRAME_SIZE, 3), jnp.float32),
    )
    jax.block_until_ready(variables)
    log(f"model init {time.perf_counter() - t0:.1f}s")

    @jax.jit
    def forward(frames_u8):
        x = eval_preprocess(frames_u8, cfg.augment, FRAME_SIZE,
                            jnp.dtype(cfg.model.dtype))
        logits = model.apply(variables, x, train=False)
        return jax.nn.softmax(logits, axis=-1)

    return cfg, forward


def bench_tpu_pipeline(paths, cfg, forward) -> float:
    """Our pipeline: threaded C++ decode → device batches → fused program."""
    import jax

    from vision_collision_detection_tpu.data.datasets import ClipDataset, ClipRecord
    from vision_collision_detection_tpu.data.loader import ClipLoader, device_prefetch

    from vision_collision_detection_tpu.ops.letterbox import letterbox_geometry

    records = [ClipRecord(os.path.basename(p), p, 0) for p in paths]
    # ship letterbox CONTENT rows only (the black bars are ~44% of the bytes
    # for 16:9 → square); the device pads them back inside the fused program
    nh, nw, _, _ = letterbox_geometry(SRC_H, SRC_W, FRAME_SIZE)
    content = (nh + nh % 2, nw + nw % 2)
    ds = ClipDataset(records, fps=CLIP_FPS, duration=CLIP_FRAMES // CLIP_FPS,
                     frame_size=FRAME_SIZE, sample_strategy="center",
                     frame_stride=2, content_box=content)
    loader = ClipLoader(ds, BATCH, num_workers=min(16, os.cpu_count() or 8),
                        prefetch_batches=3)

    # warmup: compile + decoder caches; consume the WHOLE pass so no
    # abandoned producer threads keep decoding into the timed trials
    out = None
    for batch in device_prefetch(iter(loader), keys=("frames",)):
        out = forward(batch["frames"])
    out.block_until_ready()

    # best-of-2: the TPU tunnel's throughput fluctuates run to run; the max
    # isolates pipeline capability from transient tunnel state
    best = 0.0
    for trial in range(2):
        n = 0
        t0 = time.perf_counter()
        out = None
        for _ in range(PASSES):
            for batch in device_prefetch(iter(loader), keys=("frames",)):
                out = forward(batch["frames"])  # async dispatch
                n += batch["frames"].shape[0]
        out.block_until_ready()
        dt = time.perf_counter() - t0
        log(f"tpu pipeline trial {trial}: {n} clips in {dt:.2f}s "
            f"→ {n / dt:.2f} clips/s")
        best = max(best, n / dt)
    return best


def bench_reference_style(paths, cfg, forward) -> float:
    """Reference-shaped pipeline: sequential decode, per-frame Python
    transform loop, unbatched forwards."""
    import jax.numpy as jnp
    from PIL import Image

    from vision_collision_detection_tpu.media.decoder import decode_frames
    from vision_collision_detection_tpu.ops.letterbox import letterbox_geometry

    mean = np.array(cfg.augment.normalize_mean, np.float32)
    std = np.array(cfg.augment.normalize_std, np.float32)

    def one_clip(path):
        # native-res decode (the reference decodes full frames, then the CPU
        # transform resizes each frame in a Python loop)
        frames = decode_frames(path, list(range(CLIP_FRAMES)))
        nh, nw, ph, pw = letterbox_geometry(
            frames.shape[1], frames.shape[2], FRAME_SIZE
        )
        out = np.zeros((CLIP_FRAMES, FRAME_SIZE, FRAME_SIZE, 3), np.float32)
        for t in range(CLIP_FRAMES):  # the per-frame loop being replaced
            img = Image.fromarray(frames[t]).resize((nw, nh), Image.BILINEAR)
            arr = np.asarray(img, np.float32) / 255.0
            arr = (arr - mean) / std
            out[t, ph:ph + nh, pw:pw + nw] = arr
        return out

    # The reference normalizes on the CPU and ships fp32 to the device (4×
    # the transfer bytes of our uint8 path); emulate with a B=1 forward that
    # takes pre-normalized floats.
    import jax

    from vision_collision_detection_tpu.models import build_model

    clip = one_clip(paths[0])
    model = build_model(cfg.model)
    variables = jax.jit(lambda k, x: model.init(k, x, train=False))(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, CLIP_FRAMES, FRAME_SIZE, FRAME_SIZE, 3), jnp.float32),
    )

    @jax.jit
    def fwd1(x):
        return jax.nn.softmax(model.apply(variables, x, train=False), axis=-1)

    fwd1(jnp.asarray(clip[None])).block_until_ready()

    rate = 0.0
    for trial in range(2):
        t0 = time.perf_counter()
        out = None
        for p in paths[:BASELINE_CLIPS]:
            clip = one_clip(p)
            out = fwd1(jnp.asarray(clip[None]))
        out.block_until_ready()
        dt = time.perf_counter() - t0
        log(f"reference-style pipeline trial {trial}: {BASELINE_CLIPS} clips "
            f"in {dt:.2f}s → {BASELINE_CLIPS / dt:.2f} clips/s")
        rate = max(rate, BASELINE_CLIPS / dt)
    return rate


def main() -> None:
    t_start = time.time()
    paths = ensure_fixtures()
    cfg, forward = build_forward()
    ours = bench_tpu_pipeline(paths, cfg, forward)
    baseline = bench_reference_style(paths, cfg, forward)
    log(f"total bench time {time.time() - t_start:.1f}s")
    print(json.dumps({
        "metric": "clips_per_sec_per_chip_e2e_decode_to_infer",
        "value": round(ours, 3),
        "unit": "clips/s",
        "vs_baseline": round(ours / baseline, 3) if baseline > 0 else None,
    }))


if __name__ == "__main__":
    main()
