"""Timing & throughput instrumentation.

Upgrades the reference's single microsecond wall clock
(``GetTimeStamp``, ``submit/xuliny-seqalkway.cpp:25-29``) to stage timers
and a first-class GCUPS meter (DP cells per second — the metric the
reference's reports only derived by hand).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


def timestamp_us() -> int:
    """Microsecond wall clock (the reference's GetTimeStamp)."""
    return time.time_ns() // 1000


class StageTimer:
    """Accumulating per-stage wall-clock timer."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(
                f"{name}: {self.totals[name]*1e3:.1f} ms"
                f" ({self.counts[name]}x)"
            )
        return "\n".join(lines)


def gcups(cells: int, seconds: float) -> float:
    """Giga cell updates per second."""
    if seconds <= 0:
        return float("inf")
    return cells / seconds / 1e9


@contextlib.contextmanager
def profile(profile_dir: Optional[str]):
    """jax.profiler trace scope (no-op when dir is None)."""
    if not profile_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
