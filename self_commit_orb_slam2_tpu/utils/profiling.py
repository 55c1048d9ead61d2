"""Tracing / profiling instrumentation.

The reference has only manual wall-clock timing in its drivers (SURVEY §5,
reference Examples/Monocular/mono_tum.cc:80-122).  Here profiling is a
first-class utility: wall-clock stage timers with summaries, plus one-line
access to the JAX device profiler (TensorBoard/Perfetto traces).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np


class StageTimer:
    """Accumulating per-stage wall-clock timer.

    Usage:
        timer = StageTimer()
        with timer("extract"):
            ...
        print(timer.summary())
    """

    def __init__(self):
        self.samples: dict[str, list[float]] = defaultdict(list)

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[name].append(time.perf_counter() - t0)

    def summary(self) -> str:
        lines = []
        for name, xs in sorted(self.samples.items()):
            a = np.array(xs) * 1e3
            lines.append(
                f"{name:24s} n={len(a):4d} median={np.median(a):8.2f}ms "
                f"mean={a.mean():8.2f}ms p90={np.percentile(a, 90):8.2f}ms"
            )
        return "\n".join(lines)

    def medians(self) -> dict[str, float]:
        return {k: float(np.median(v)) for k, v in self.samples.items()}


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a JAX device profile (open with TensorBoard or Perfetto).

    with device_trace("/tmp/slam_trace"):
        slam.track_rgbd(...)
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
