"""Profiling and timing utilities — first-class perf observability.

The reference's only metric is a per-frame elapsed log line
(``pkg/camera/output.go:200-204``); here we provide rolling timers with
percentiles, throughput units (fps, Mpix/s), and one-line integration
with ``jax.profiler`` traces for TensorBoard.
"""

from __future__ import annotations

import collections
import contextlib
import time

import numpy as np


class RollingTimer:
    """Rolling window of durations with percentile/throughput stats."""

    def __init__(self, window: int = 200):
        self._samples = collections.deque(maxlen=window)

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._samples.append(time.perf_counter() - t0)

    def add(self, seconds: float):
        self._samples.append(seconds)

    def stats(self, pixels: int | None = None) -> dict:
        if not self._samples:
            return {}
        a = np.array(self._samples)
        out = {
            "n": len(a),
            "ms_mean": round(float(a.mean()) * 1e3, 3),
            "ms_p50": round(float(np.median(a)) * 1e3, 3),
            "ms_p95": round(float(np.percentile(a, 95)) * 1e3, 3),
            "ms_max": round(float(a.max()) * 1e3, 3),
            "fps": round(1.0 / float(a.mean()), 2),
        }
        if pixels:
            out["mpix_per_s"] = round(pixels / 1e6 / float(a.mean()), 2)
        return out


@contextlib.contextmanager
def profiler_trace(logdir: str):
    """Capture a jax.profiler trace (view with TensorBoard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
