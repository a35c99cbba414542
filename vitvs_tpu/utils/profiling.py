"""Tracing / profiling utilities.

The reference's only instrumentation is per-iteration wall-clock prints
(vitvs_v2.py:594,630-632) and a total-time field in the results npz.  Here:

* :class:`StageTimer` — per-stage wall timing with `block_until_ready`
  fencing, so device work is attributed to the stage that launched it;
* :func:`trace_to` — a context manager around `jax.profiler.trace` producing
  TensorBoard-viewable XPlane traces of the jitted pipeline;
* :func:`annotate` — `jax.profiler.TraceAnnotation` passthrough for marking
  host-side phases inside a trace.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any, Dict

import jax


class StageTimer:
    """Accumulating per-stage timer.

    >>> t = StageTimer()
    >>> with t.stage("vit"):
    ...     out = jitted_forward(x)   # block_until_ready fenced on exit
    >>> t.summary()
    {'vit': {'total_s': ..., 'count': 1, 'mean_ms': ...}}
    """

    def __init__(self, fence: bool = True):
        self.fence = fence
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, result: Any = None):
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            if self.fence:
                tofence = holder.get("result", result)
                if tofence is not None:
                    jax.block_until_ready(tofence)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_ms": 1000.0 * self.totals[name] / max(self.counts[name], 1),
            }
            for name in self.totals
        }

    def report(self) -> str:
        rows = sorted(self.summary().items(), key=lambda kv: -kv[1]["total_s"])
        width = max((len(k) for k, _ in rows), default=5)
        lines = [f"{'stage':<{width}}  {'calls':>6}  {'mean ms':>9}  {'total s':>8}"]
        for k, v in rows:
            lines.append(f"{k:<{width}}  {v['count']:>6}  {v['mean_ms']:>9.3f}  {v['total_s']:>8.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace_to(log_dir: str):
    """XPlane profiler trace of everything inside the context."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Host-side trace annotation (visible in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)
