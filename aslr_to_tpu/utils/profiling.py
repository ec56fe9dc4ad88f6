"""Profiling helpers (SURVEY §5 tracing plan).

The reference has no tracing at all; here solves already return a
per-iteration metrics pytree (``SolveResult.log``), and this module adds
device-level tracing via ``jax.profiler`` plus a wall-clock phase timer
for host-side attribution.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Wall-clock phase accumulator with block_until_ready fencing.

    NOTE: on the tunneled single-chip setup each sync costs ~30 ms; use
    this for coarse phases (full solves), not micro-kernels.
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, result=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if result is not None:
                jax.block_until_ready(result)
            self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0

    def summary(self) -> str:
        total = sum(self.totals.values()) or 1.0
        lines = [f"{k}: {v * 1e3:.1f} ms ({100 * v / total:.0f}%)" for k, v in sorted(self.totals.items())]
        return "\n".join(lines)
