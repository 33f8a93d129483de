"""On-chip profile of the flagship train step: where do the milliseconds go?

Captures a jax.profiler trace of the convnext_tiny+GRU train step (the hot
loop the reference times at /root/reference/nexar_train.py:1114-1200),
parses the chrome trace the TPU runtime emits, and rolls device op time up
into categories (convolution / matmul / scan(GRU) / fusion / layout /
other). Also sweeps batch size for step time, clips/s, and an MFU estimate
from XLA's cost analysis, and times the eval forward the same way.

Writes PROFILE_r03.json at the repo root. Run on the real chip:
    python scripts/profile_train.py [--batches 16 32 64] [--trace-batch 16]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC_H, SRC_W = 720, 1280
FRAME_SIZE = 224
CLIP_FRAMES = 50

_PEAK_FLOPS = {
    "TPU v4": 275e12, "TPU v5e": 197e12, "TPU v5 lite": 197e12,
    "TPU v5p": 459e12, "TPU v6e": 918e12,
}


def log(m):
    print(m, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# Trace parsing (chrome trace format the TPU runtime writes next to xplane)
# ---------------------------------------------------------------------------
def _categorize(name: str) -> str:
    n = name.lower()
    if "convolution" in n or n.startswith("conv") or "%conv" in n:
        return "convolution"
    if n.startswith("dot") or "dot_general" in n or "einsum" in n:
        return "matmul"
    if n.startswith("while") or "scan" in n or "body" in n and "while" in n:
        return "scan_gru"
    if n.startswith("fusion") or n.startswith("loop_fusion") or (
            "fusion" in n):
        return "fusion"
    if any(k in n for k in ("copy", "transpose", "bitcast", "reshape",
                            "pad", "slice", "concatenate")):
        return "layout_copy"
    if any(k in n for k in ("all-reduce", "all-gather", "collective",
                            "reduce-scatter")):
        return "collective"
    if "infeed" in n or "outfeed" in n or "host" in n:
        return "host_transfer"
    return "other"


def _module_of(args: dict, name: str) -> str:
    """Bucket a device op into a pipeline module from its source/tf_op."""
    src = args.get("source", "")
    top = args.get("tf_op", "")
    if any(m in src for m in ("affine.py", "augment.py", "color.py",
                              "letterbox", "preprocess", "pallas_ops")):
        return "preprocess_augment"
    if "/backbone/" in top:
        return ("backbone_bwd" if "transpose(jvp" in top else "backbone_fwd")
    if "/temporal/" in top or "while" in name.lower():
        return "temporal_head"
    return "other"


def parse_trace(trace_dir: str, n_steps: int) -> dict:
    files = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not files:
        return {"error": f"no trace.json.gz under {trace_dir}"}
    with gzip.open(files[-1], "rt") as f:
        doc = json.load(f)
    ev = doc.get("traceEvents", [])

    pid_names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = [p for p, n in pid_names.items()
                   if "TPU" in n or "device" in n.lower()]
    log(f"trace processes: {pid_names}")
    if not device_pids:
        return {"error": "no TPU device process in trace",
                "processes": pid_names}

    # Non-MXU overhead categories: the round-4 review asked for a per-item
    # accounting of the "loop fusion" + "data formatting" residue so each
    # remaining ms is either killed or proven roofline-irreducible.
    _OVERHEAD = ("loop fusion", "data formatting", "reverse", "copy", "pad",
                 "input fusion", "output fusion")

    by_mod, by_cat, by_key, fus = {}, {}, {}, {}
    total_us = 0.0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        a = e.get("args", {})
        if "hlo_category" not in a:  # only real device op events
            continue
        dur = float(e.get("dur", 0.0))
        total_us += dur
        cat = a["hlo_category"]
        mod = _module_of(a, e.get("name", ""))
        by_cat[cat] = by_cat.get(cat, 0.0) + dur
        by_mod[mod] = by_mod.get(mod, 0.0) + dur
        key = f"{mod} | {cat} | {a.get('source', '?').split('/')[-1]}"
        by_key[key] = by_key.get(key, 0.0) + dur
        if cat in _OVERHEAD:
            fk = f"{mod} | {cat} | {a.get('source', '?').split('/')[-1]}"
            rec = fus.setdefault(fk, {"us": 0.0, "calls": 0, "ops": set()})
            rec["us"] += dur
            rec["calls"] += 1
            rec["ops"].add(e.get("name", "?"))

    def table(d, n=None):
        items = sorted(d.items(), key=lambda kv: -kv[1])[:n]
        return {k: round(v / 1e3 / max(n_steps, 1), 2) for k, v in items}

    fusion_items = sorted(fus.items(), key=lambda kv: -kv[1]["us"])[:15]
    top_fusions = {
        k: {
            "ms_per_step": round(v["us"] / 1e3 / max(n_steps, 1), 3),
            "calls_per_step": round(v["calls"] / max(n_steps, 1), 1),
            "distinct_ops": len(v["ops"]),
            "example_op": sorted(v["ops"])[0],
        }
        for k, v in fusion_items
    }

    return {
        "n_steps_traced": n_steps,
        "device_busy_ms_per_step": round(total_us / 1e3 / max(n_steps, 1), 3),
        "by_module_ms_per_step": table(by_mod),
        "by_hlo_category_ms_per_step": table(by_cat),
        "top_module_category_source_ms": table(by_key, 20),
        "top_overhead_fusions": top_fusions,
    }


# ---------------------------------------------------------------------------
def build_step(cfg, batch, train=True):
    import dataclasses

    import jax

    from vision_collision_detection_tpu.ops.letterbox import letterbox_geometry
    from vision_collision_detection_tpu.train.steps import (
        create_train_state,
        make_eval_step,
        make_train_step,
    )

    T = cfg.data.num_frames // 2
    nh, nw, _, _ = letterbox_geometry(SRC_H, SRC_W, FRAME_SIZE)
    content = (nh + nh % 2, nw + nw % 2)
    model, state = create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=100,
        sample_frames_shape=(1, T, content[0], content[1], 3),
    )
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (batch, T, content[0], content[1], 3),
                          dtype=np.uint8)
    targets = rng.integers(0, cfg.model.num_classes, (batch,)).astype(np.int64)
    mask = np.ones((batch,), np.float32)
    key = jax.random.PRNGKey(1)
    dev_frames = jax.device_put(frames)
    if train:
        step = make_train_step(model, cfg, None)
        args = (state, dev_frames, targets, mask, key)
    else:
        step = make_eval_step(model, cfg, None)
        args = (state, dev_frames, targets, mask)
    return model, state, step, args


def cost_flops(model, cfg, state, dev_frames, targets, mask, key, train=True):
    import jax

    from vision_collision_detection_tpu.train.steps import (
        make_eval_step,
        make_train_step,
    )

    try:
        if train:
            fn = make_train_step(model, cfg, None, donate=False)
            lowered = jax.jit(lambda s, f, t, mk, k: fn(s, f, t, mk, k)).lower(
                state, dev_frames, targets, mask, key)
        else:
            fn = make_eval_step(model, cfg, None)
            lowered = jax.jit(lambda s, f, t, mk: fn(s, f, t, mk)).lower(
                state, dev_frames, targets, mask)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) or None
    except Exception as e:
        log(f"cost analysis unavailable: {e}")
        return None


def time_step(step, args, state_pos=0, reps=10, train=True):
    import jax

    state = args[state_pos]
    out = step(*args)
    if train:
        state, m = out
        args = (state,) + args[1:]
        jax.block_until_ready(m)
    else:
        jax.block_until_ready(out)
    times = []
    for trial in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = step(*args)
            if train:
                state, m = out
                args = (state,) + args[1:]
        jax.block_until_ready(m if train else out)
        times.append((time.perf_counter() - t0) / reps)
    return float(np.median(times)) * 1000.0  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[16, 32, 64])
    ap.add_argument("--trace-batch", type=int, default=16)
    ap.add_argument("--trace-steps", type=int, default=3)
    ap.add_argument("--trace-dir", default="/tmp/vcd_profile_trace")
    ap.add_argument("--output", default=os.path.join(REPO, "PROFILE_r03.json"))
    ap.add_argument("--gelu", choices=["config", "approx", "exact"],
                    default="config",
                    help="override cfg.model.gelu_approximate for ablations")
    ap.add_argument("--dwconv", choices=["config", "pallas", "lax"],
                    default="config",
                    help="override the ConvNeXt depthwise-conv path")
    ap.add_argument("--fused-mlp", choices=["config", "on", "off"],
                    default="config",
                    help="override the fused LN+MLP+scale+residual Pallas "
                         "kernel (ops/convnext_mlp_pallas.py) for A/Bs")
    ap.add_argument("--no-trace", action="store_true")
    ap.add_argument("--parse-only", action="store_true",
                    help="re-parse an existing trace dir into --output "
                         "(merging with an existing JSON if present)")
    args = ap.parse_args()

    if args.parse_only:
        out = {}
        if os.path.exists(args.output):
            with open(args.output) as f:
                out = json.load(f)
        trace = parse_trace(args.trace_dir, args.trace_steps)
        trace["trace_batch"] = args.trace_batch
        out["trace"] = trace
        with open(args.output, "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps(trace, indent=2))
        return

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(REPO, ".bench_cache", "xla"))

    from vision_collision_detection_tpu.config import ExperimentConfig

    kind = jax.devices()[0].device_kind
    peak = next((v for k, v in _PEAK_FLOPS.items()
                 if k.lower() in kind.lower()), None)
    log(f"device: {kind}, bf16 peak {peak and peak / 1e12} TFLOP/s")

    cfg = ExperimentConfig()
    import dataclasses
    model_kw = {"frame_subsample": 1}
    if args.gelu != "config":
        model_kw["gelu_approximate"] = args.gelu == "approx"
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, **model_kw))
    # Override via the ops-module toggles (read at call time) — assigning
    # flax module class attributes does NOT change dataclass __init__
    # defaults, so the old `cn.ConvNeXt.dwconv_pallas = ...` form was a
    # silent no-op.
    if args.dwconv != "config":
        from vision_collision_detection_tpu.ops import dwconv_pallas
        dwconv_pallas.PALLAS_DWCONV_DEFAULT = args.dwconv == "pallas"
    if args.fused_mlp != "config":
        from vision_collision_detection_tpu.ops import convnext_mlp_pallas
        convnext_mlp_pallas.FUSED_MLP_DEFAULT = args.fused_mlp == "on"
    log(f"gelu_approximate={cfg.model.gelu_approximate} "
        f"platform={jax.devices()[0].platform}")

    out = {"device_kind": kind, "bf16_peak_flops": peak,
           "config": "convnext_tiny+gru 25f@224 (content-box input)",
           "sweep": []}

    # ---- batch sweep: train + eval ------------------------------------
    for b in args.batches:
        log(f"== batch {b} ==")
        row = {"batch": b}
        try:
            model, state, step, sargs = build_step(cfg, b, train=True)
            t0 = time.perf_counter()
            ms = time_step(step, sargs, train=True)
            log(f"train step {ms:.1f} ms ({b / ms * 1000:.1f} clips/s) "
                f"[compile+measure {time.perf_counter() - t0:.0f}s]")
            flops = cost_flops(model, cfg, state, sargs[1], sargs[2],
                               sargs[3], sargs[4], train=True)
            mfu = (flops / (ms / 1e3)) / peak if flops and peak else None
            row.update({
                "train_step_ms": round(ms, 2),
                "train_clips_per_s": round(b / ms * 1000, 1),
                "train_flops": flops,
                "train_mfu": round(mfu, 4) if mfu else None,
            })
        except Exception as e:
            # OOM at large batch is a legitimate sweep outcome
            row["train_error"] = str(e)[:300]
            log(f"train at batch {b} failed: {str(e)[:200]}")
        try:
            model2, state2, estep, eargs = build_step(cfg, b, train=False)
            ems = time_step(estep, eargs, train=False)
            eflops = cost_flops(model2, cfg, state2, eargs[1], eargs[2],
                                eargs[3], None, train=False)
            emfu = (eflops / (ems / 1e3)) / peak if eflops and peak else None
            log(f"eval step {ems:.1f} ms ({b / ems * 1000:.1f} clips/s)")
            row.update({
                "eval_step_ms": round(ems, 2),
                "eval_clips_per_s": round(b / ems * 1000, 1),
                "eval_mfu": round(emfu, 4) if emfu else None,
            })
        except Exception as e:
            row["eval_error"] = str(e)[:300]
            log(f"eval at batch {b} failed: {str(e)[:200]}")
        out["sweep"].append(row)

    # ---- trace at trace-batch -----------------------------------------
    if args.no_trace:
        with open(args.output, "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps(out, indent=2))
        return
    log(f"== trace at batch {args.trace_batch} ==")
    model, state, step, sargs = build_step(cfg, args.trace_batch, train=True)
    state, m = step(*sargs)
    jax.block_until_ready(m)
    sargs = (state,) + sargs[1:]
    os.makedirs(args.trace_dir, exist_ok=True)
    jax.profiler.start_trace(args.trace_dir)
    for _ in range(args.trace_steps):
        stt, m = step(*sargs)
        sargs = (stt,) + sargs[1:]
    jax.block_until_ready(m)
    jax.profiler.stop_trace()
    out["trace"] = parse_trace(args.trace_dir, args.trace_steps)
    out["trace"]["trace_batch"] = args.trace_batch

    with open(args.output, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
