"""Profiling / tracing support (auxiliary subsystem).

The reference has no profiler hooks (SURVEY.md §5) — its only timing is
mmcv's iter-time logging.  Here any tool accepts ``--profile DIR`` and
wraps the hot region in a ``jax.profiler`` trace viewable in
TensorBoard/XProf (device + host timelines, HLO cost attribution), plus a
lightweight wall-clock section timer for quick printouts.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler.trace wrapper; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir, create_perfetto_link=False):
        yield


class SectionTimer:
    """Accumulating wall-clock section timer with a one-line report."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        parts = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, n = self.totals[name], self.counts[name]
            parts.append(f"{name}: {t:.2f}s/{n} ({t / n * 1e3:.1f}ms avg)")
        return " | ".join(parts)
