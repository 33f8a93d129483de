"""Scaled-config benchmark: vivit_small, 32 frames @ 336 px, remat on.

BASELINE.json config 5. Compiles + times the full bf16 training step
(preprocess + forward + backward + AdamW) on the real chip and records step
time, train clips/s, and device memory stats. Writes SCALED_r02.json at the
repo root and logs to stderr.

Run: python scripts/bench_scaled_vivit.py [--batch N] [--eval-only]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--size", type=int, default=336)
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--output", default=os.path.join(REPO, "SCALED_r02.json"))
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".bench_cache", "xla"))

    from vision_collision_detection_tpu.config import ExperimentConfig
    from vision_collision_detection_tpu.train.steps import (
        create_train_state,
        make_eval_step,
        make_train_step,
    )

    cfg = ExperimentConfig().override({
        "model.backbone": "vivit_small",
        "model.temporal_mode": "attention",  # unused by ViViT, kept valid
        "model.remat": True,
        "model.patch_size": 14,
        "data.fps": 8, "data.duration": 4,  # 32 frames
        "data.frame_size": args.size,
        "data.batch_size": args.batch,
        "augment.enabled": True,
        "augment.blur_sigma": 0.0,  # keep the aug program conv-free
    })
    assert cfg.data.num_frames == args.frames

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}")

    t0 = time.perf_counter()
    model, state = create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=100,
        sample_frames_shape=(1, args.frames, args.size, args.size, 3),
    )
    n_params = sum(int(np.prod(np.shape(x)))
                   for x in jax.tree_util.tree_leaves(state.params))
    log(f"init {time.perf_counter() - t0:.1f}s, {n_params / 1e6:.1f}M params")

    rng = np.random.default_rng(0)
    B = args.batch
    frames = jax.device_put(rng.integers(
        0, 255, (B, args.frames, args.size, args.size, 3), dtype=np.uint8))
    targets = jax.device_put(
        rng.integers(0, 3, (B,)).astype(np.int64))
    mask = jax.device_put(np.ones((B,), np.float32))
    key = jax.random.PRNGKey(1)

    result = {
        "config": {"backbone": "vivit_small", "frames": args.frames,
                   "size": args.size, "batch": B, "remat": True,
                   "dtype": cfg.model.dtype},
        "device_kind": dev.device_kind,
        "params_m": round(n_params / 1e6, 2),
    }

    if not args.eval_only:
        train_step = make_train_step(model, cfg, None)
        t0 = time.perf_counter()
        state, m = train_step(state, frames, targets, mask, key)
        jax.block_until_ready(m)
        result["train_compile_s"] = round(time.perf_counter() - t0, 1)
        log(f"train step compile+first {result['train_compile_s']}s, "
            f"loss {float(m['loss']):.4f}")

        rates = []
        for trial in range(3):
            reps = 4
            t0 = time.perf_counter()
            m_last = None
            for _ in range(reps):
                state, m_last = train_step(state, frames, targets, mask, key)
            jax.block_until_ready(m_last)
            dt = time.perf_counter() - t0
            rates.append(reps * B / dt)
            log(f"train trial {trial}: {rates[-1]:.2f} clips/s "
                f"({dt / reps * 1000:.0f} ms/step)")
        med = statistics.median(rates)
        result["train_clips_per_s"] = round(med, 3)
        result["train_step_ms"] = round(B / med * 1000, 1)

    eval_step = make_eval_step(model, cfg, None)
    t0 = time.perf_counter()
    out = eval_step(state, frames, targets, mask)
    jax.block_until_ready(out)
    result["eval_compile_s"] = round(time.perf_counter() - t0, 1)
    rates = []
    for trial in range(3):
        reps = 6
        t0 = time.perf_counter()
        o = None
        for _ in range(reps):
            o = eval_step(state, frames, targets, mask)
        jax.block_until_ready(o)
        rates.append(reps * B / (time.perf_counter() - t0))
        log(f"eval trial {trial}: {rates[-1]:.2f} clips/s")
    result["eval_clips_per_s"] = round(statistics.median(rates), 3)

    try:
        stats = dev.memory_stats()
        result["memory"] = {
            "bytes_in_use": stats.get("bytes_in_use"),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            "bytes_limit": stats.get("bytes_limit"),
        }
        log(f"peak HBM {stats.get('peak_bytes_in_use', 0) / 2**30:.2f} GiB "
            f"of {stats.get('bytes_limit', 0) / 2**30:.2f} GiB")
    except Exception as e:
        log(f"memory stats unavailable: {e}")

    with open(args.output, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
