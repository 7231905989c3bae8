"""Tracing and profiling helpers.

The reference's observability is a 10-frame moving-average FPS counter and
ad-hoc ``time.time()`` spans (reference main.py:127-130,
check_homography_consistency.py:37-44). This module keeps that contract and
adds what the reference lacks (SURVEY §5 "add jax.profiler traces"):

- :class:`FpsCounter` — the reference's moving-average FPS
- :class:`Stopwatch` — named span timing with summary stats
- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of the device programs
- :func:`device_memory_stats` — live HBM usage per device
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, List, Optional


class FpsCounter:
    """Moving-average FPS over the last ``window`` frames (main.py:127-130)."""

    def __init__(self, window: int = 10):
        self.window = window
        self._samples: List[float] = []
        self._last: Optional[float] = None

    def tick(self) -> float:
        now = time.time()
        if self._last is not None:
            dt = max(now - self._last, 1e-9)
            self._samples.append(1.0 / dt)
            self._samples = self._samples[-self.window:]
        self._last = now
        return self.fps

    @property
    def fps(self) -> float:
        return sum(self._samples) / len(self._samples) if self._samples else 0.0


class Stopwatch:
    """Named span accumulator: ``with sw.span('yolo'): ...``; ``sw.summary()``."""

    def __init__(self):
        self._spans: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._spans[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        import numpy as np

        out = {}
        for name, vals in self._spans.items():
            arr = np.asarray(vals) * 1000
            out[name] = {
                "count": len(vals),
                "mean_ms": float(arr.mean()),
                "p50_ms": float(np.percentile(arr, 50)),
                "p99_ms": float(np.percentile(arr, 99)),
            }
        return out


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace (view with TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, Dict[str, float]]:
    """Per-device HBM usage in MB (empty dict if the backend lacks stats)."""
    import jax

    out = {}
    for dev in jax.devices():
        stats = getattr(dev, "memory_stats", lambda: None)()
        if stats:
            out[str(dev)] = {
                "bytes_in_use_mb": stats.get("bytes_in_use", 0) / 1e6,
                "peak_bytes_mb": stats.get("peak_bytes_in_use", 0) / 1e6,
                "limit_mb": stats.get("bytes_limit", 0) / 1e6,
            }
    return out
