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

Methodology (hardened per round-1 and round-2 review):
- every leg reports the MEDIAN of its trials (stderr shows each trial);
- the HEADLINE ratio comes from ≥5 e2e trials INTERLEAVED with ≥5
  baseline trials (ababab...), each baseline trial over ≥32 clips, so
  host load drift hits both legs equally; per-leg spread
  ((max-min)/median) is recorded in diagnostics;
- stage breakdown in diagnostics: decode-only clips/s (host ceiling),
  device-only clips/s (chip capability), e2e clips/s (the metric);
- a decode-scaling leg times the C++ batch decoder at pool sizes 1/2/4
  on identical work (decode parallelism evidence for multi-core hosts);
- a train-step leg reports train clips/s, step-time ms, and an MFU estimate
  from XLA's cost analysis.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"diagnostics"}. Everything else goes to stderr.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
import traceback

import numpy as np

CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
NUM_CLIPS = 32
CLIP_FRAMES = 50
CLIP_FPS = 10
SRC_H, SRC_W = 720, 1280  # dashcam-typical 720p
FRAME_SIZE = 224
BATCH = 16
PASSES = 4
BASELINE_CLIPS = 32
TRIALS = 3
HEADLINE_TRIALS = int(os.environ.get("VCD_BENCH_TRIALS", "7"))
# interleaved e2e/baseline cycles; median over 7 is robust to the
# minute-scale host-speed drift this 1-core box exhibits (each extra cycle
# costs ~2 min of bench wall time). VCD_BENCH_TRIALS overrides for quick
# leg smokes only — headline artifacts must use the default 7.

# bf16 peak FLOP/s per chip for MFU estimates (public TPU specs)
_PEAK_FLOPS = {
    "TPU v4": 275e12,
    "TPU v5e": 197e12,
    "TPU v5 lite": 197e12,
    "TPU v5p": 459e12,
    "TPU v6e": 918e12,
}


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def acquire_backend(retries: int = 3, wait_s: float = 60.0,
                    probe_timeout_s: float = 180.0) -> str | None:
    """Probe JAX backend availability in a SUBPROCESS with a hard timeout,
    retrying with backoff (round-4 lesson: the TPU tunnel can be down at
    snapshot time, and an in-process ``jax.devices()`` can HANG >300 s in
    that state, so the probe must be out-of-process and killable). Returns
    None when the backend is usable, else the final error string — the
    caller then emits a structured JSON line with host-only legs instead of
    dying with a traceback (BENCH_r04.json's failure mode)."""
    probe_src = "import jax; d = jax.devices(); print(d[0].device_kind)"
    last_err = "unknown"
    for attempt in range(retries):
        try:
            r = subprocess.run(
                [sys.executable, "-c", probe_src],
                capture_output=True, text=True, timeout=probe_timeout_s,
            )
            if r.returncode == 0:
                kind = r.stdout.strip().splitlines()[-1] if r.stdout else "?"
                log(f"backend probe ok (attempt {attempt}): {kind}")
                return None
            last_err = (r.stderr or r.stdout or "").strip()[-500:]
        except subprocess.TimeoutExpired:
            last_err = f"backend probe hung >{probe_timeout_s:.0f}s (killed)"
        log(f"backend probe failed (attempt {attempt}): {last_err[-200:]}")
        if attempt + 1 < retries:
            log(f"retrying in {wait_s:.0f}s ...")
            time.sleep(wait_s)
    return last_err


def emit_host_only(error: str) -> None:
    """Device unavailable: still print ONE parseable JSON line carrying the
    error plus every leg that needs no TPU (decode ceiling + pool scaling +
    the baseline's host-side per-frame transform cost)."""
    diagnostics: dict = {"backend_error": error[-500:]}
    try:
        paths = ensure_fixtures()
        ds = make_dataset(paths, repeats=PASSES, fast_resize=True)
        warm_fast = make_dataset(paths, fast_resize=True)
        decode_one = setup_decode_only(ds, warm_fast)
        decode_med, decode_trials = _median_trials(decode_one,
                                                   label="decode-only")
        diagnostics["decode_only_clips_per_s"] = round(decode_med, 3)
        diagnostics["decode_trials"] = [round(r, 3) for r in decode_trials]
        diagnostics["decode_scaling"] = bench_decode_scaling(paths)
        diagnostics["baseline_host_transform"] = bench_baseline_host_only(
            paths)
    except Exception as e:  # never trade the JSON line for a traceback
        diagnostics["host_leg_error"] = f"{type(e).__name__}: {e}"[-500:]
    print(json.dumps({
        "metric": "clips_per_sec_per_chip_e2e_decode_to_infer",
        "value": None,
        "unit": "clips/s",
        "vs_baseline": None,
        "error": f"TPU backend unavailable: {error[-300:]}",
        "diagnostics": diagnostics,
    }))


def bench_baseline_host_only(paths) -> dict:
    """The reference-style pipeline's HOST cost (decode + per-frame PIL
    resize + numpy normalize) without any device forward — runs even when
    the TPU is down, bounding the baseline from above (its e2e rate can
    only be slower once device forwards are added)."""
    from PIL import Image

    from vision_collision_detection_tpu.media.decoder import decode_frames
    from vision_collision_detection_tpu.ops.letterbox import letterbox_geometry

    mean = np.float32([0.45, 0.45, 0.45])
    std = np.float32([0.225, 0.225, 0.225])
    n = min(len(paths), 8)

    def one():
        t0 = time.perf_counter()
        for p in paths[:n]:
            frames = decode_frames(p, list(range(CLIP_FRAMES)))
            nh, nw, ph, pw = letterbox_geometry(
                frames.shape[1], frames.shape[2], FRAME_SIZE)
            out = np.zeros((CLIP_FRAMES, FRAME_SIZE, FRAME_SIZE, 3),
                           np.float32)
            for t in range(CLIP_FRAMES):
                img = Image.fromarray(frames[t]).resize((nw, nh),
                                                        Image.BILINEAR)
                arr = np.asarray(img, np.float32) / 255.0
                out[t, ph:ph + nh, pw:pw + nw] = (arr - mean) / std
        return n / (time.perf_counter() - t0)

    one()  # warm decoder caches
    med, trials = _median_trials(one, label="baseline-host-only")
    return {"clips_per_s_upper_bound": round(med, 3),
            "trials": [round(r, 3) for r in trials]}


def _median_trials(fn, trials: int = TRIALS, label: str = "") -> tuple:
    """Run fn() `trials` times; fn returns clips/s. → (median, [trials])."""
    rates = []
    for t in range(trials):
        r = fn()
        rates.append(r)
        log(f"{label} trial {t}: {r:.2f} clips/s")
    return statistics.median(rates), rates


def _fixture_frames(rng, i: int) -> np.ndarray:
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
        # (int16 accumulate + clip: uint8 += wraps near-255 pixels)
        noise = rng.integers(0, 30,
                             size=(SRC_H // 8, SRC_W // 8, 3)).astype(np.int16)
        # same pixels as np.kron(noise, ones((8,8,1))) but ~11x faster on
        # this 1-core host (kron alone was ~10 s of a 12 s fixture synth)
        block = np.repeat(np.repeat(noise, 8, axis=0), 8, axis=1)
        frames[t] = np.clip(frames[t].astype(np.int16) + block,
                            0, 255).astype(np.uint8)
    return frames


def ensure_fixtures(h264: bool = False) -> list:
    """Synthetic 720p dashcam-like fixtures. Default codec is mpeg4
    (cheap all-reference streams). ``h264=True`` encodes the SAME pixels as
    H.264 with disposable B-frames (libx264, bframes=2, 1-s GOP) — the codec
    family real dashcams emit, where the decoder's non-ref skip actually
    engages (round-4 verdict: the mpeg4 headline left that path inert)."""
    from vision_collision_detection_tpu.media.decoder import encode_video, probe

    os.makedirs(CACHE_DIR, exist_ok=True)
    tag = "h264_" if h264 else ""
    paths = [os.path.join(CACHE_DIR, f"clip_{tag}{i:03d}.mp4")
             for i in range(NUM_CLIPS)]
    rng = np.random.default_rng(0)
    for i, p in enumerate(paths):
        if os.path.exists(p):
            try:
                if probe(p).num_frames == CLIP_FRAMES:
                    continue
            except Exception:
                pass
        frames = _fixture_frames(rng, i)
        if h264:
            # ultrafast halves nothing in the DECODE path we measure but
            # cuts encode from ~19 s to ~3.5 s per fixture on this 1-core
            # host; b_adapt=0 under ultrafast emits strictly periodic
            # disposable B-frames, so the non-ref skip leg still engages
            # (verified: 6/50 frames skipped at stride 2).
            encode_video(p, frames, fps=CLIP_FPS, codec="libx264",
                         gop=CLIP_FPS, bframes=2, crf=23, preset="ultrafast")
        else:
            encode_video(p, frames, fps=CLIP_FPS)
        log(f"encoded {'h264 ' if h264 else ''}fixture {i + 1}/{NUM_CLIPS}")
    return paths


def make_dataset(paths, repeats: int = 1, fast_resize: bool = False,
                 lowres: int = 0):
    """repeats>1 replays the fixture set so throughput legs measure one
    CONTINUOUS loader stream (steady-state pipelining) instead of restarting
    the prefetch producer every 2-batch pass — the restart hole was ~15% of
    the round-3 e2e leg.

    fast_resize: planar-YUV fast decode (the HEADLINE pipeline since round
    4; AUC-parity evidence vs the torch reference transform is committed in
    PARITY_FAST_r04.json and, on H.264 B-frame fixtures with a
    non-saturated mid-range-AUC leg, PARITY_FAST_r05.json). The exact path is still benched as an
    interleaved diagnostic leg.

    lowres: reduced-resolution decode at 1/2^k size (mpeg4-family codecs;
    inert on H.264). AUC-parity evidence vs the torch reference transform:
    PARITY_LOWRES_r05.json (solo lowres, delta 0.0014, within budget);
    composed with fast_resize the delta grows to 0.0038 and misses the
    ±0.002 budget (PARITY_FASTLOW_r05.json) — the bench leg that composes
    both is a speed-ceiling diagnostic, not an adoptable config."""
    from vision_collision_detection_tpu.data.datasets import ClipDataset, ClipRecord
    from vision_collision_detection_tpu.ops.letterbox import letterbox_geometry

    records = [ClipRecord(os.path.basename(p), p, 0) for p in paths * repeats]
    # ship letterbox CONTENT rows only (the black bars are ~44% of the bytes
    # for 16:9 → square); the device pads them back inside the fused program
    nh, nw, _, _ = letterbox_geometry(SRC_H, SRC_W, FRAME_SIZE)
    content = (nh + nh % 2, nw + nw % 2)
    return ClipDataset(records, fps=CLIP_FPS, duration=CLIP_FRAMES // CLIP_FPS,
                       frame_size=FRAME_SIZE, sample_strategy="center",
                       frame_stride=2, content_box=content,
                       fast_resize=fast_resize, lowres_decode=lowres)


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


def setup_decode_only(ds, warm_ds):
    """Host decode ceiling: loader without any device work (one continuous
    stream over the PASSES-repeated dataset, same shape as the e2e leg).
    Returns a warmed single-trial closure so decode trials can run
    INTERLEAVED with the e2e trials — host speed drifts minute-to-minute on
    shared hosts, and `e2e_fraction_of_host_decode_ceiling` is only
    meaningful when both legs sample the same drift."""
    from vision_collision_detection_tpu.data.loader import ClipLoader

    workers = min(16, os.cpu_count() or 8)
    for batch in ClipLoader(warm_ds, BATCH, num_workers=workers):
        pass  # warm decoder caches

    loader = ClipLoader(ds, BATCH, num_workers=workers, prefetch_batches=3)

    def one():
        n = 0
        t0 = time.perf_counter()
        for batch in loader:
            n += batch["frames"].shape[0]
        return n / (time.perf_counter() - t0)

    return one


def bench_device_only(forward, ds) -> tuple:
    """Chip capability: forward over resident device batches (no host feed).
    Measures B=16 (the e2e pipeline batch) and B=32 (the serving default
    adopted from the round-5 eval-batch sweep, PROFILE_r05.json — the
    larger bucket buys ~17% on-chip at these shapes)."""
    import jax
    import jax.numpy as jnp

    from vision_collision_detection_tpu.data.loader import ClipLoader

    loader = ClipLoader(ds, BATCH, num_workers=4, prefetch_batches=1)
    batch = next(iter(loader))
    dev = jax.device_put(batch["frames"])
    forward(dev).block_until_ready()  # compile

    def timed(batch_dev, reps=8):
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = forward(batch_dev)
        out.block_until_ready()
        return reps * batch_dev.shape[0] / (time.perf_counter() - t0)

    med, trials = _median_trials(lambda: timed(dev), label="device-only")

    dev32 = jnp.concatenate([dev, dev], axis=0)
    forward(dev32).block_until_ready()  # compile serving bucket
    med32, trials32 = _median_trials(lambda: timed(dev32),
                                     label="device-only-b32")
    return med, trials, med32, trials32


def setup_tpu_pipeline(ds, warm_ds, forward):
    """Our e2e pipeline: threaded C++ decode → device batches → fused
    program, ONE continuous prefetch stream per trial (the decode producer
    never idles between passes). Returns a warmed single-trial closure
    (clips/s)."""
    from vision_collision_detection_tpu.data.loader import ClipLoader, device_prefetch

    workers = min(16, os.cpu_count() or 8)

    # warmup: compile + decoder caches; consume the WHOLE pass so no
    # abandoned producer threads keep decoding into the timed trials
    out = None
    warm = ClipLoader(warm_ds, BATCH, num_workers=workers, prefetch_batches=3)
    for batch in device_prefetch(iter(warm), keys=("frames",)):
        out = forward(batch["frames"])
    out.block_until_ready()

    loader = ClipLoader(ds, BATCH, num_workers=workers, prefetch_batches=3)

    def one():
        n = 0
        t0 = time.perf_counter()
        out = None
        for batch in device_prefetch(iter(loader), keys=("frames",)):
            out = forward(batch["frames"])  # async dispatch
            n += batch["frames"].shape[0]
        out.block_until_ready()
        return n / (time.perf_counter() - t0)

    return one


def setup_reference_style(paths, cfg):
    """Reference-shaped pipeline: sequential decode, per-frame Python
    transform loop, unbatched fp32 forwards. Returns a warmed
    single-trial closure (clips/s)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from vision_collision_detection_tpu.media.decoder import decode_frames
    from vision_collision_detection_tpu.models import build_model
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

    # Fairness variant (round-3 review): the reference evaluates at batch
    # 8/GPU (/root/reference/nexar_train_distributed.py:73), so also measure
    # the reference-style transforms feeding BATCHED B=8 forwards — the
    # strongest honest form of the baseline. The headline uses whichever
    # baseline is faster.
    REF_B = 8

    @jax.jit
    def fwd8(x):
        return jax.nn.softmax(model.apply(variables, x, train=False), axis=-1)

    fwd8(jnp.zeros((REF_B, CLIP_FRAMES, FRAME_SIZE, FRAME_SIZE, 3),
                   jnp.float32)).block_until_ready()

    def one():
        t0 = time.perf_counter()
        out = None
        for p in paths[:BASELINE_CLIPS]:
            c = one_clip(p)
            out = fwd1(jnp.asarray(c[None]))
        out.block_until_ready()
        return BASELINE_CLIPS / (time.perf_counter() - t0)

    def one_batched():
        t0 = time.perf_counter()
        out = None
        buf = np.empty((REF_B, CLIP_FRAMES, FRAME_SIZE, FRAME_SIZE, 3),
                       np.float32)
        for b0 in range(0, BASELINE_CLIPS, REF_B):
            group = paths[b0:b0 + REF_B]
            for j, p in enumerate(group):
                buf[j] = one_clip(p)
            out = fwd8(jnp.asarray(buf))
        out.block_until_ready()
        return BASELINE_CLIPS / (time.perf_counter() - t0)

    return one, one_batched


def bench_decode_scaling(paths) -> dict:
    """C++ batch-decoder pool scaling: identical work at 1/2/4 threads.
    On a multi-core host this shows near-linear scaling; on a 1-core host
    it bounds the pool's coordination overhead (the two together turn
    BENCH.md's cores→clips/s extrapolation into measurement)."""
    from vision_collision_detection_tpu.data.datasets import ClipDataset  # noqa: F401
    from vision_collision_detection_tpu.media.decoder import decode_batch
    from vision_collision_detection_tpu.ops.letterbox import letterbox_geometry

    nh, nw, _, _ = letterbox_geometry(SRC_H, SRC_W, FRAME_SIZE)
    content = (nh + nh % 2, nw + nw % 2)
    n = min(len(paths), 16)
    idx = np.tile(np.arange(0, CLIP_FRAMES, 2, dtype=np.int64), (n, 1))
    decode_batch(paths[:n], idx, content, fast_resize=True)  # warm caches
    out = {}
    for threads in (1, 2, 4):
        t0 = time.perf_counter()
        decode_batch(paths[:n], idx, content, num_threads=threads,
                     fast_resize=True)
        dt = time.perf_counter() - t0
        out[f"pool_{threads}"] = round(n / dt, 3)
        log(f"decode-scaling pool={threads}: {n / dt:.2f} clips/s")
    out["host_cores"] = os.cpu_count()
    return out


def bench_h264_skip_stats(paths_h264) -> dict:
    """One profiled decode pass over the H.264 fixtures with the headline
    sampling (stride 2): records how many disposable frames the non-ref skip
    actually dropped at the decoder — the evidence that the skip path is
    LIVE on B-frame streams (it is structurally inert on the mpeg4 headline
    fixtures). Runs AFTER the timed trials so profiler overhead never
    touches them."""
    from vision_collision_detection_tpu.media.decoder import (
        decode_batch,
        decode_profile,
        profile_decode,
    )
    from vision_collision_detection_tpu.ops.letterbox import letterbox_geometry

    nh, nw, _, _ = letterbox_geometry(SRC_H, SRC_W, FRAME_SIZE)
    content = (nh + nh % 2, nw + nw % 2)
    n = min(len(paths_h264), 16)
    idx = np.tile(np.arange(0, CLIP_FRAMES, 2, dtype=np.int64), (n, 1))
    profile_decode(True)
    try:
        decode_batch(paths_h264[:n], idx, content, fast_resize=True)
        prof = decode_profile()
    finally:
        profile_decode(False)
    decoded = prof["frames_decoded"]
    skipped = prof["frames_skipped_nonref"]
    total = decoded + skipped + prof["frames_skipped_by_seek"]
    return {
        "h264_frames_decoded": decoded,
        "h264_frames_skipped_nonref": skipped,
        "h264_frames_skipped_by_seek": prof["frames_skipped_by_seek"],
        "h264_nonref_skip_fraction": round(skipped / total, 3) if total else 0.0,
        "h264_codec": "libx264 ultrafast bframes=2 gop=1s",
    }


def bench_train_step(cfg) -> dict:
    """Device-side training throughput on the flagship config: train clips/s,
    step time, and an MFU estimate (the hot loop the reference times at
    /root/reference/nexar_train.py:1114-1200)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from vision_collision_detection_tpu.ops.letterbox import letterbox_geometry
    from vision_collision_detection_tpu.train.steps import (
        create_train_state,
        make_train_step,
    )

    cfg = dataclasses.replace(cfg, model=dataclasses.replace(
        cfg.model, frame_subsample=1))
    T = cfg.data.num_frames // 2
    nh, nw, _, _ = letterbox_geometry(SRC_H, SRC_W, FRAME_SIZE)
    content = (nh + nh % 2, nw + nw % 2)

    model, state = create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=100,
        sample_frames_shape=(1, T, content[0], content[1], 3),
    )
    train_step = make_train_step(model, cfg, None)

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, (BATCH, T, content[0], content[1], 3),
                          dtype=np.uint8)
    targets = rng.integers(0, cfg.model.num_classes, (BATCH,)).astype(np.int64)
    mask = np.ones((BATCH,), np.float32)
    key = jax.random.PRNGKey(1)

    dev_frames = jax.device_put(frames)
    t0 = time.perf_counter()
    state, m = train_step(state, dev_frames, targets, mask, key)
    jax.block_until_ready(m)
    log(f"train step compile+first {time.perf_counter() - t0:.1f}s")

    # FLOP estimate from XLA's cost analysis (forward+backward+update)
    flops = None
    try:
        lowered = jax.jit(
            lambda s, f, t_, mk, k: make_train_step(model, cfg, None,
                                                    donate=False)(s, f, t_, mk, k)
        ).lower(state, dev_frames, targets, mask, key)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0)) or None
    except Exception as e:
        log(f"cost analysis unavailable: {e}")

    def one():
        nonlocal state
        reps = 5
        t0 = time.perf_counter()
        m_last = None
        for _ in range(reps):
            state, m_last = train_step(state, dev_frames, targets, mask, key)
        jax.block_until_ready(m_last)
        return reps * BATCH / (time.perf_counter() - t0)

    rate, rates = _median_trials(one, label="train-step")
    step_ms = BATCH / rate * 1000.0
    mfu = None
    kind = jax.devices()[0].device_kind
    peak = next((v for k, v in _PEAK_FLOPS.items()
                 if k.lower() in kind.lower()), None)
    if flops and peak:
        mfu = (flops / (step_ms / 1000.0)) / peak
    return {
        "train_clips_per_s": round(rate, 3),
        "train_trials": [round(r, 3) for r in rates],
        "train_step_ms": round(step_ms, 2),
        "train_step_flops": flops,
        "device_kind": kind,
        "mfu": round(mfu, 4) if mfu is not None else None,
    }


def main() -> None:
    t_start = time.time()
    err = acquire_backend()
    if err is not None:
        emit_host_only(err)
        return
    try:
        _run_full_bench(t_start)
    except Exception:
        # Mid-run failure (e.g. the tunnel dropping between probe and run):
        # the artifact must still be ONE parseable JSON line, not a raw
        # traceback tail (BENCH_r04.json's failure mode).
        tb = traceback.format_exc()
        log(tb)
        emit_host_only(tb.strip().splitlines()[-1])


def _run_full_bench(t_start: float) -> None:
    train_diag = {}
    run_train = "--no-train" not in sys.argv
    run_h264 = "--no-h264" not in sys.argv
    run_lowres = "--no-lowres" not in sys.argv
    paths = ensure_fixtures()
    paths_h264 = ensure_fixtures(h264=True) if run_h264 else []
    cfg, forward = build_forward()
    warm_ds = make_dataset(paths)
    ds_exact = make_dataset(paths, repeats=PASSES)
    warm_fast = make_dataset(paths, fast_resize=True)
    ds = make_dataset(paths, repeats=PASSES, fast_resize=True)

    device_med, device_trials, device32_med, device32_trials = \
        bench_device_only(forward, warm_ds)

    # headline legs: interleaved trials (abcde abcde ...) so host load drift
    # hits the decode ceiling, the numerator, the exact-path diagnostic leg,
    # and both baseline variants equally. Headline pipeline = planar-YUV
    # fast decode (AUC parity vs the torch reference: PARITY_FAST_r04/r05.json);
    # decode ceiling measured on the SAME mode; the exact path recorded as
    # the interleaved A/B diagnostic.
    decode_one = setup_decode_only(ds, warm_fast)
    e2e_one = setup_tpu_pipeline(ds, warm_fast, forward)
    e2e_exact_one = setup_tpu_pipeline(ds_exact, warm_ds, forward)
    e2e_h264_one = None
    if run_h264:
        # H.264-with-B-frames diagnostic leg (round-4 verdict: the mpeg4
        # headline fixtures are all-reference streams on which the decoder's
        # non-ref skip is structurally inert — this leg runs the SAME pixels
        # through the codec family real dashcams emit). repeats=2 keeps the
        # leg's wall cost bounded; it is still one continuous loader stream.
        warm_h264 = make_dataset(paths_h264, fast_resize=True)
        ds_h264 = make_dataset(paths_h264, repeats=2, fast_resize=True)
        e2e_h264_one = setup_tpu_pipeline(ds_h264, warm_h264, forward)
    e2e_lowres_one = None
    if run_lowres:
        # Reduced-resolution decode diagnostic leg: fast-resize + lowres=1
        # (libavcodec decodes the mpeg4 fixtures at half size). Kept as a
        # diagnostic, not the headline, for two measured reasons:
        # (1) the lever is structurally inert on H.264 (libavcodec
        #     max_lowres=0 there), the codec family real dashcams emit, so
        #     promoting it would tune the headline to the mpeg4 fixtures;
        # (2) parity: solo lowres is within the ±0.002 AUC budget
        #     (PARITY_LOWRES_r05.json, delta 0.0014) but THIS composed
        #     fast-resize+lowres config misses it (PARITY_FASTLOW_r05.json,
        #     delta 0.0038 on 99 hard clips) — the leg measures the lever's
        #     speed ceiling, not an adoptable config.
        # repeats=2 bounds the leg's wall cost.
        warm_low = make_dataset(paths, fast_resize=True, lowres=1)
        ds_low = make_dataset(paths, repeats=2, fast_resize=True, lowres=1)
        e2e_lowres_one = setup_tpu_pipeline(ds_low, warm_low, forward)
    base_one, base_batched_one = setup_reference_style(paths, cfg)
    decode_trials, e2e_trials, base_trials, base_b8_trials = [], [], [], []
    e2e_exact_trials, e2e_h264_trials, e2e_lowres_trials = [], [], []
    for t in range(HEADLINE_TRIALS):
        decode_trials.append(decode_one())
        log(f"decode-only trial {t}: {decode_trials[-1]:.2f} clips/s")
        e2e_trials.append(e2e_one())
        log(f"e2e tpu pipeline trial {t}: {e2e_trials[-1]:.2f} clips/s")
        e2e_exact_trials.append(e2e_exact_one())
        log(f"e2e exact-resize trial {t}: {e2e_exact_trials[-1]:.2f} clips/s")
        if e2e_h264_one is not None:
            e2e_h264_trials.append(e2e_h264_one())
            log(f"e2e h264 trial {t}: {e2e_h264_trials[-1]:.2f} clips/s")
        if e2e_lowres_one is not None:
            e2e_lowres_trials.append(e2e_lowres_one())
            log(f"e2e lowres trial {t}: "
                f"{e2e_lowres_trials[-1]:.2f} clips/s")
        base_trials.append(base_one())
        log(f"reference-style trial {t}: {base_trials[-1]:.2f} clips/s")
        base_b8_trials.append(base_batched_one())
        log(f"reference-style B=8 trial {t}: {base_b8_trials[-1]:.2f} clips/s")
    decode_med = statistics.median(decode_trials)
    e2e_med = statistics.median(e2e_trials)
    e2e_exact_med = statistics.median(e2e_exact_trials)
    base_b1_med = statistics.median(base_trials)
    base_b8_med = statistics.median(base_b8_trials)
    # headline denominator: the STRONGER baseline variant
    base_med = max(base_b1_med, base_b8_med)

    def spread(rs):
        return round((max(rs) - min(rs)) / statistics.median(rs), 3)

    decode_scaling = bench_decode_scaling(paths)
    h264_diag = {}
    if run_h264:
        h264_diag = bench_h264_skip_stats(paths_h264)
        h264_diag["e2e_h264_clips_per_s"] = round(
            statistics.median(e2e_h264_trials), 3)
        h264_diag["e2e_h264_trials"] = [round(r, 3) for r in e2e_h264_trials]
    if run_train:
        train_diag = bench_train_step(cfg)

    bottleneck = "host_decode" if decode_med < device_med else "device"
    # Structured decode-bound caveat (round-2 review: encode it in the
    # artifact, not prose): on a 1-core host BOTH legs are decode-bound and
    # the ratio measures decode arithmetic, not pipeline design. The design
    # headroom is the chip's measured capability over the e2e rate; the
    # baseline's per-clip CPU time is decode + its serial per-frame
    # transform loop, which added cores do not parallelize.
    headline_caveat = None
    if bottleneck == "host_decode":
        base_clip_s = 1.0 / base_med if base_med > 0 else None
        decode_clip_s = 1.0 / decode_med if decode_med > 0 else None
        headline_caveat = {
            "decode_bound": True,
            "host_cores": os.cpu_count(),
            "e2e_fraction_of_host_decode_ceiling": round(
                e2e_med / decode_med, 3),
            "device_only_headroom_x": round(device_med / e2e_med, 1),
            "baseline_serial_transform_s_per_clip": round(
                base_clip_s - decode_clip_s, 3)
            if base_clip_s and decode_clip_s else None,
            "note": (
                "ratio >=5x requires decode cores; our decode scales with "
                "the pool (C++ batch decoder) while the baseline's "
                "per-frame Python transform loop is serial — at >=2 cores "
                "our e2e doubles and the baseline does not"),
        }
    log(f"stage split: decode-only {decode_med:.2f} | device-only "
        f"{device_med:.2f} | e2e {e2e_med:.2f} clips/s → bottleneck: "
        f"{bottleneck}")
    log(f"e2e spread {spread(e2e_trials)} | baseline spread "
        f"{spread(base_trials)}")
    log(f"total bench time {time.time() - t_start:.1f}s")
    print(json.dumps({
        "metric": "clips_per_sec_per_chip_e2e_decode_to_infer",
        "value": round(e2e_med, 3),
        "unit": "clips/s",
        "vs_baseline": round(e2e_med / base_med, 3) if base_med > 0 else None,
        "diagnostics": {
            "decode_only_clips_per_s": round(decode_med, 3),
            "decode_trials": [round(r, 3) for r in decode_trials],
            "device_only_clips_per_s": round(device_med, 3),
            "device_trials": [round(r, 3) for r in device_trials],
            "device_only_b32_clips_per_s": round(device32_med, 3),
            "device_only_b32_trials": [round(r, 3)
                                       for r in device32_trials],
            "e2e_trials": [round(r, 3) for r in e2e_trials],
            "e2e_spread": spread(e2e_trials),
            "fast_resize": True,
            "fast_resize_parity_artifact": "PARITY_FAST_r05.json",
            "e2e_exact_resize_clips_per_s": round(e2e_exact_med, 3),
            "e2e_exact_resize_trials": [round(r, 3)
                                        for r in e2e_exact_trials],
            "fast_resize_speedup": round(e2e_med / e2e_exact_med, 3)
            if e2e_exact_med > 0 else None,
            **({"e2e_lowres_clips_per_s": round(
                    statistics.median(e2e_lowres_trials), 3),
                "e2e_lowres_trials": [round(r, 3)
                                      for r in e2e_lowres_trials],
                "lowres_speedup_vs_headline": round(
                    statistics.median(e2e_lowres_trials) / e2e_med, 3)
                if e2e_med > 0 else None,
                "lowres_parity_artifact": "PARITY_LOWRES_r05.json",
                "lowres_composed_parity_artifact":
                    "PARITY_FASTLOW_r05.json (delta 0.0038, OUT of the "
                    "±0.002 budget — leg is a speed ceiling, not an "
                    "adoptable config)"}
               if e2e_lowres_trials else {}),
            "baseline_clips_per_s": round(base_med, 3),
            "baseline_variant_used": "B=8" if base_b8_med >= base_b1_med
            else "B=1",
            "baseline_b1_clips_per_s": round(base_b1_med, 3),
            "baseline_trials": [round(r, 3) for r in base_trials],
            "baseline_b8_clips_per_s": round(base_b8_med, 3),
            "baseline_b8_trials": [round(r, 3) for r in base_b8_trials],
            "baseline_spread": spread(base_trials),
            "baseline_clips": BASELINE_CLIPS,
            "trials_interleaved": True,
            "decode_scaling": decode_scaling,
            **h264_diag,
            "bottleneck": bottleneck,
            "headline_caveat": headline_caveat,
            **train_diag,
        },
    }))


if __name__ == "__main__":
    main()
