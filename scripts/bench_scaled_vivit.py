"""Scaled-config benchmark: vivit_small, 32 frames @ 336 px.

BASELINE.json config 5. Compiles + times the full bf16 training step
(preprocess + forward + backward + AdamW) on the real chip across a
(batch, remat) sweep and records step time, train clips/s, eval clips/s,
and peak-HBM evidence. Memory comes from ``device.memory_stats()`` when the
runtime exposes it, with a guaranteed fallback to the compiled executable's
``memory_analysis()`` (argument/output/temp/code bytes) so the artifact
always carries a headroom number (round-2 review: the memory block silently
vanished when memory_stats was unavailable on this runtime).

Run on the chip: python scripts/bench_scaled_vivit.py
  [--sweep 2:1 4:1 8:1 4:0]   batch:remat rows (default)
  [--frames 32 --size 336]
Writes SCALED_r03.json at the repo root.
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


def device_memory(dev, compiled=None) -> dict:
    """Peak-HBM evidence: runtime stats if available, else the compiled
    executable's static memory analysis."""
    out = {}
    try:
        stats = dev.memory_stats() or {}
        if stats.get("peak_bytes_in_use") or stats.get("bytes_in_use"):
            out["source"] = "memory_stats"
            out["bytes_in_use"] = stats.get("bytes_in_use")
            out["peak_bytes_in_use"] = stats.get("peak_bytes_in_use")
            out["bytes_limit"] = stats.get("bytes_limit")
            return out
    except Exception as e:
        log(f"memory_stats unavailable: {e}")
    if compiled is not None:
        try:
            ma = compiled.memory_analysis()
            out["source"] = "compiled_memory_analysis"
            for k in ("argument_size_in_bytes", "output_size_in_bytes",
                      "temp_size_in_bytes", "generated_code_size_in_bytes"):
                out[k] = int(getattr(ma, k, 0))
            out["total_bytes"] = int(
                out["argument_size_in_bytes"] + out["temp_size_in_bytes"]
                + out["generated_code_size_in_bytes"])
            return out
        except Exception as e:
            log(f"memory_analysis unavailable: {e}")
    out["source"] = "unavailable"
    return out


def run_config(cfg_base, B, remat, frames, size, dev, train=True,
               attn="xla"):
    import jax

    from vision_collision_detection_tpu.train.steps import (
        create_train_state,
        make_eval_step,
        make_train_step,
    )

    cfg = cfg_base.override({
        "model.remat": bool(remat), "data.batch_size": B,
        "model.attention_impl": attn,
    })
    t0 = time.perf_counter()
    model, state = create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=100,
        sample_frames_shape=(1, frames, size, size, 3),
    )
    n_params = sum(int(np.prod(np.shape(x)))
                   for x in jax.tree_util.tree_leaves(state.params))
    log(f"[B={B} remat={remat} attn={attn}] init "
        f"{time.perf_counter() - t0:.1f}s, {n_params / 1e6:.1f}M params")

    rng = np.random.default_rng(0)
    frames_d = jax.device_put(rng.integers(
        0, 255, (B, frames, size, size, 3), dtype=np.uint8))
    targets = jax.device_put(rng.integers(0, 3, (B,)).astype(np.int64))
    mask = jax.device_put(np.ones((B,), np.float32))
    key = jax.random.PRNGKey(1)

    row = {"batch": B, "remat": bool(remat), "attention_impl": attn,
           "params_m": round(n_params / 1e6, 2)}

    train_step = make_train_step(model, cfg, None)
    compiled = None
    try:
        compiled = train_step.lower(
            state, frames_d, targets, mask, key).compile()
    except Exception as e:
        log(f"explicit lower/compile failed (continuing): {e}")

    t0 = time.perf_counter()
    try:
        state, m = train_step(state, frames_d, targets, mask, key)
        jax.block_until_ready(m)
    except Exception as e:
        # OOM is a legitimate sweep outcome: record it and move on
        row["train_error"] = str(e)[:300]
        log(f"[B={B} remat={remat}] train step failed: {e}")
        return row
    row["train_compile_s"] = round(time.perf_counter() - t0, 1)

    rates = []
    for trial in range(3):
        reps = 4
        t0 = time.perf_counter()
        m_last = None
        for _ in range(reps):
            state, m_last = train_step(state, frames_d, targets, mask, key)
        jax.block_until_ready(m_last)
        rates.append(reps * B / (time.perf_counter() - t0))
        log(f"[B={B} remat={remat} attn={attn}] train trial {trial}: "
            f"{rates[-1]:.2f} clips/s")
    med = statistics.median(rates)
    row["train_clips_per_s"] = round(med, 3)
    row["train_step_ms"] = round(B / med * 1000, 1)
    row["memory"] = device_memory(dev, compiled)
    return row


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sweep", nargs="+", default=["2:1", "4:1", "8:1", "4:0"],
                   help="batch:remat[:attn] rows (attn: xla|flash)")
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--size", type=int, default=336)
    p.add_argument("--eval-batch", type=int, default=8)
    p.add_argument("--output", default=os.path.join(REPO, "SCALED_r03.json"))
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".bench_cache", "xla"))

    from vision_collision_detection_tpu.config import ExperimentConfig
    from vision_collision_detection_tpu.train.steps import (
        create_train_state,
        make_eval_step,
    )

    cfg_base = ExperimentConfig().override({
        "model.backbone": "vivit_small",
        "model.temporal_mode": "attention",  # unused by ViViT, kept valid
        "model.patch_size": 14,
        "data.fps": 8, "data.duration": 4,  # 32 frames
        "data.frame_size": args.size,
        "augment.enabled": True,
        "augment.blur_sigma": 0.0,  # keep the aug program conv-free
    })
    assert cfg_base.data.num_frames == args.frames

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}")

    result = {
        "config": {"backbone": "vivit_small", "frames": args.frames,
                   "size": args.size, "dtype": cfg_base.model.dtype},
        "device_kind": dev.device_kind,
        "sweep": [],
    }

    for spec in args.sweep:
        parts = spec.split(":")
        b, r = int(parts[0]), int(parts[1])
        attn = parts[2] if len(parts) > 2 else "xla"
        result["sweep"].append(run_config(
            cfg_base, b, r, args.frames, args.size, dev, attn=attn))

    # eval leg at the largest batch (BASELINE config-5 inference shape)
    B = args.eval_batch
    cfg = cfg_base.override({"data.batch_size": B, "model.remat": False})
    model, state = create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=100,
        sample_frames_shape=(1, args.frames, args.size, args.size, 3),
    )
    rng = np.random.default_rng(0)
    frames_d = jax.device_put(rng.integers(
        0, 255, (B, args.frames, args.size, args.size, 3), dtype=np.uint8))
    targets = jax.device_put(rng.integers(0, 3, (B,)).astype(np.int64))
    mask = jax.device_put(np.ones((B,), np.float32))
    eval_step = make_eval_step(model, cfg, None)
    t0 = time.perf_counter()
    out = eval_step(state, frames_d, targets, mask)
    jax.block_until_ready(out)
    result["eval_compile_s"] = round(time.perf_counter() - t0, 1)
    rates = []
    for trial in range(3):
        reps = 6
        t0 = time.perf_counter()
        o = None
        for _ in range(reps):
            o = eval_step(state, frames_d, targets, mask)
        jax.block_until_ready(o)
        rates.append(reps * B / (time.perf_counter() - t0))
        log(f"eval trial {trial}: {rates[-1]:.2f} clips/s")
    result["eval_batch"] = B
    result["eval_clips_per_s"] = round(statistics.median(rates), 3)
    result["eval_memory"] = device_memory(dev)

    with open(args.output, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
