"""Profiling/tracing hooks (absent in the reference — SURVEY.md §5.1: no
profiler imports, no timers; the old TimeLogger survives only as a stale
.pyc).

Two levels:
  * :class:`PhaseTimer` — cheap per-phase wall-clock accounting the Coach
    always keeps (negative sampling / diffusion / rebuild / joint / eval).
  * :func:`trace` — `jax.profiler` trace context for a full XLA/TPU profile
    (view with TensorBoard or xprof); enable via ``DIFFMM_TRACE_DIR`` or the
    CLI ``--trace-dir``.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class PhaseTimer:
    """Accumulates wall seconds per named phase across an epoch/run."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        parts = [
            f"{name}={self.totals[name]:.2f}s/{self.counts[name]}"
            for name in sorted(self.totals)
        ]
        return ", ".join(parts)

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace(trace_dir: str | None):
    """jax.profiler trace context; no-op when ``trace_dir`` is falsy."""
    if not trace_dir:
        yield
        return
    with jax.profiler.trace(trace_dir):
        yield


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in the profiler timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield
