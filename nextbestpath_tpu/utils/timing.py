"""Wall-clock phase timers + jax.profiler hooks.

Upgrades the reference's print-based timing (TimeCheck,
macarons/utility/utils.py:86-111; compute_time lists,
train_macarons.py:1150-1156) to a structured timer with optional XLA
profiler traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


class TimeCheck:
    """Reference-compatible simple timer (utils.py:86-111)."""

    def __init__(self):
        self.t0: Optional[float] = None

    def start(self):
        self.t0 = time.time()

    def current_time(self) -> float:
        return time.time() - (self.t0 or time.time())


class PhaseTimers:
    """Accumulating named phase timers (loop_time/backward_time analog)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block: bool = False):
        t0 = time.time()
        yield
        if block:
            jax.effects_barrier()
        self.totals[name] += time.time() - t0
        self.counts[name] += 1

    def report(self) -> Dict[str, float]:
        return {
            k: {"total_s": self.totals[k], "mean_s": self.totals[k] / max(self.counts[k], 1)}
            for k in self.totals
        }


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace context (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
