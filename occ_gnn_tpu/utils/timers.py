"""Accumulating phase timers.

Python analog of the reference's enum-indexed global timers
(/root/reference/src/util/timer.h:7-48) and the sampler's phase
accumulators (sampler.py:20-27): named phases accumulate wall-clock
across an epoch and print a one-line summary.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager


def _trace_annotation(name: str):
    """jax.profiler.TraceAnnotation for the phase (the NVTX-range analog,
    reference python/train.py:68) so --profile-dir traces carry phase
    labels; a no-op nullcontext when jax isn't importable."""
    try:
        import jax

        return jax.profiler.TraceAnnotation(name)
    except Exception:
        from contextlib import nullcontext

        return nullcontext()


class PhaseTimers:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        with _trace_annotation(name):
            try:
                yield
            finally:
                dt = time.perf_counter() - t0
                self.totals[name] += dt
                self.counts[name] += 1

    def clear(self):
        self.totals.clear()
        self.counts.clear()

    def summary(self) -> str:
        parts = [f"{k}={v:.3f}s" for k, v in sorted(self.totals.items())]
        return " ".join(parts)

    def as_dict(self) -> dict:
        return dict(self.totals)
