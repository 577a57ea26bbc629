"""Profiling & phase-timing utilities.

Ref parity: the reference's only instrumentation is wall-clock deltas around
prep/solve (ref: statistics.h:35-40, structured_optimal_control_problem.cpp:
116-149). Here (SURVEY.md §5): `jax.profiler` device traces plus a host-side
phase timer whose results slot into the signal recorder.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class PhaseTimer:
    """Accumulate wall-clock per named phase (blocks on device results)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": self.totals[k],
                "count": self.counts[k],
                "mean_s": self.totals[k] / max(self.counts[k], 1),
            }
            for k in self.totals
        }


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace context: view with TensorBoard / xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
