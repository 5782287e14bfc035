"""Tracing/profiling utilities.

The reference's observability is ad-hoc wall-clock deltas at debug level
(reference: quality.py:83-187, robust_grasp_quality.py:94-116,
grasp_sampler.py:715). Here: a stage timer that blocks on device work so the
numbers are real, plus one-call JAX profiler trace capture for xprof/
tensorboard.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class StageTimer:
    """Accumulating per-stage wall-clock timer (device-synchronized)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        """``sync``: optional array/pytree to block_until_ready on exit so
        async dispatch does not hide device time."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                import jax

                jax.block_until_ready(sync)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict:
        return {
            name: {"total_s": round(self.totals[name], 4),
                   "calls": self.counts[name],
                   "mean_ms": round(1e3 * self.totals[name]
                                    / max(self.counts[name], 1), 3)}
            for name in sorted(self.totals)
        }

    def report(self) -> str:
        lines = [f"{name:30s} {s['calls']:5d} calls  {s['mean_ms']:9.3f} ms/call"
                 for name, s in self.summary().items()]
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a JAX profiler trace viewable in tensorboard/xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
