"""Profiling helpers: jax.profiler traces + throughput counters.

The reference has no profiler (SURVEY.md §5 — only it/s and epoch timers in
its dashboard, /root/reference/nexar_train.py:468-471,1068-1070). Here:
- ``trace(dir)`` context: captures a TensorBoard-viewable device trace;
- ``annotate(name)``: TraceAnnotation for host-side phases;
- ``StepTimer``: steady-state it/s and clips/s with warmup exclusion,
  the counters the reference logs plus percentiles.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device profile: ``with trace('runs/prof'): step(...)``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Host-side trace annotation (shows as a named span in the trace)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Throughput counter with warmup exclusion.

    >>> t = StepTimer(warmup_steps=2, items_per_step=batch_size)
    >>> for batch in loader:
    ...     with t.step():
    ...         train_step(...)
    >>> t.summary()  # {'steps', 'mean_ms', 'p50_ms', 'p95_ms', 'items_per_sec'}
    """

    def __init__(self, warmup_steps: int = 1, items_per_step: int = 1):
        self.warmup_steps = warmup_steps
        self.items_per_step = items_per_step
        self.durations: List[float] = []
        self._seen = 0

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self._seen += 1
        if self._seen > self.warmup_steps:
            self.durations.append(dt)

    def summary(self) -> Dict[str, float]:
        if not self.durations:
            return {"steps": 0}
        d = np.asarray(self.durations)
        return {
            "steps": len(d),
            "mean_ms": float(d.mean() * 1000),
            "p50_ms": float(np.percentile(d, 50) * 1000),
            "p95_ms": float(np.percentile(d, 95) * 1000),
            "steps_per_sec": float(1.0 / d.mean()),
            "items_per_sec": float(self.items_per_step / d.mean()),
        }
