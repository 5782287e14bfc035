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


def fetch_sync(x) -> None:
    """Serialize with the device by fetching 4 bytes of a scalar slice.

    On tunneled TPU attachments ``jax.block_until_ready`` can return before
    execution finishes (dispatch is deeply asynchronous through the relay),
    so wall-clock timing must be bounded by a real device->host fetch. The
    slice is computed ON DEVICE (enqueued after all prior work; in-order
    execution), so the 4-byte arrival proves completion — never fetch whole
    arrays for synchronization, multi-MB relay transfers take seconds.
    """
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    float(leaf.ravel()[0])


class StageTimer:
    """Accumulating per-stage wall-clock timer (device-synchronized)."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        """``sync``: optional array/pytree to fetch-synchronize on exit so
        async dispatch does not hide device time (see ``fetch_sync``)."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                fetch_sync(sync)
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
