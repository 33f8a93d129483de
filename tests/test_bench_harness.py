"""The bench harness must NEVER die unstructured: when the TPU backend is
unavailable (round-4 failure mode, BENCH_r04.json rc=1 with a raw traceback
tail), ``bench.py`` has to print ONE parseable JSON line carrying the error
plus whatever host-only legs completed."""

import io
import json
import sys

import numpy as np
import pytest

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
import bench  # noqa: E402


def _capture_stdout(fn):
    buf = io.StringIO()
    old = sys.stdout
    sys.stdout = buf
    try:
        fn()
    finally:
        sys.stdout = old
    return buf.getvalue()


def test_emit_host_only_is_one_json_line_even_when_host_legs_fail(monkeypatch):
    # Worst case: fixtures can't even be built — the JSON line still lands.
    def boom():
        raise RuntimeError("no disk")

    monkeypatch.setattr(bench, "ensure_fixtures", boom)
    out = _capture_stdout(lambda: bench.emit_host_only("tunnel down"))
    lines = [ln for ln in out.strip().splitlines() if ln]
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["value"] is None and rec["vs_baseline"] is None
    assert "tunnel down" in rec["error"]
    assert "host_leg_error" in rec["diagnostics"]


def test_main_routes_backend_failure_to_structured_output(monkeypatch):
    monkeypatch.setattr(bench, "acquire_backend", lambda: "UNAVAILABLE: x")
    calls = {}
    monkeypatch.setattr(bench, "emit_host_only",
                        lambda err: calls.setdefault("err", err))
    bench.main()
    assert "UNAVAILABLE" in calls["err"]


def test_main_emits_json_when_full_bench_raises_midrun(monkeypatch):
    monkeypatch.setattr(bench, "acquire_backend", lambda: None)

    def die(t_start):
        raise RuntimeError("backend died mid-run")

    monkeypatch.setattr(bench, "_run_full_bench", die)
    monkeypatch.setattr(bench, "ensure_fixtures",
                        lambda: (_ for _ in ()).throw(RuntimeError("skip")))
    out = _capture_stdout(bench.main)
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["value"] is None
    assert "backend died mid-run" in rec["error"]


def test_acquire_backend_retries_and_returns_final_error(monkeypatch):
    attempts = []

    class FakeResult:
        returncode = 1
        stdout = ""
        stderr = "RuntimeError: Unable to initialize backend 'axon'"

    def fake_run(*args, **kwargs):
        attempts.append(1)
        return FakeResult()

    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    err = bench.acquire_backend(retries=3, wait_s=0.0)
    assert len(attempts) == 3
    assert "Unable to initialize backend" in err


def test_baseline_host_only_smoke(tmp_path, monkeypatch):
    # Tiny fixture: the host-only baseline leg must run without a device.
    from vision_collision_detection_tpu.media.decoder import encode_video

    rng = np.random.default_rng(0)
    p = str(tmp_path / "c.mp4")
    frames = rng.integers(0, 255, (bench.CLIP_FRAMES, 64, 112, 3),
                          dtype=np.uint8)
    encode_video(p, frames, fps=bench.CLIP_FPS)
    out = bench.bench_baseline_host_only([p])
    assert out["clips_per_s_upper_bound"] > 0
    assert len(out["trials"]) == 3


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-v"]))
