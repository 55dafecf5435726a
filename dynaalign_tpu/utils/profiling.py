"""Profiling / tracing utilities.

The reference has no tracing subsystem — its benchmarks are ad-hoc
``bench::mark``/``system.time`` calls in workspace notebooks
(workspace/yulinWspc.Rmd:791-821; SURVEY.md §5).  Here:

* :func:`trace` — context manager capturing a ``jax.profiler`` device
  trace (viewable in TensorBoard / Perfetto);
* :class:`Timings` — lightweight named wall-clock section registry used
  by the benchmark harness (pairs/sec, cell-updates/sec summaries).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timings:
    """Named wall-clock sections with simple throughput accounting."""

    def __init__(self):
        self.sections: dict[str, list[float]] = defaultdict(list)
        self.items: dict[str, float] = defaultdict(float)

    @contextlib.contextmanager
    def section(self, name: str, items: float = 0.0):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.sections[name].append(time.perf_counter() - t0)
            self.items[name] += items

    def total(self, name: str) -> float:
        return sum(self.sections[name])

    def rate(self, name: str) -> float:
        """items per second for a section (0 when untimed)."""
        t = self.total(name)
        return self.items[name] / t if t > 0 else 0.0

    def report(self) -> str:
        lines = []
        for name in self.sections:
            t = self.total(name)
            n = len(self.sections[name])
            line = f"{name}: {t:.3f}s over {n} call(s)"
            if self.items[name]:
                line += f", {self.rate(name):,.1f} items/s"
            lines.append(line)
        return "\n".join(lines)
