"""Lightweight profiling helpers.

The reference only records wall-clock spans (s3dis_simulator.py:247,291).
Here we add throughput counters (rays/sec/chip, rooms/hour) used by the
benchmarks, plus an optional hook into ``jax.profiler`` traces.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, Optional


class Timer:
    """Context-manager wall-clock timer with named accumulation."""

    def __init__(self) -> None:
        self.spans: Dict[str, float] = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.spans[name] = self.spans.get(name, 0.0) + time.perf_counter() - t0

    def total(self) -> float:
        return sum(self.spans.values())


@dataclass
class RateCounter:
    """Throughput counter: accumulate work units against elapsed seconds."""

    unit: str = "items"
    count: float = 0.0
    seconds: float = 0.0
    _t0: Optional[float] = field(default=None, repr=False)

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, n: float) -> None:
        if self._t0 is None:
            raise RuntimeError("RateCounter.stop() called before start().")
        self.seconds += time.perf_counter() - self._t0
        self.count += n
        self._t0 = None

    @property
    def rate(self) -> float:
        return self.count / self.seconds if self.seconds > 0 else 0.0

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return f"RateCounter({self.rate:,.0f} {self.unit}/s over {self.seconds:.3f}s)"


@contextlib.contextmanager
def trace(name: str, enabled: bool = False):
    """Optionally wrap a block in a jax.profiler TraceAnnotation."""
    if not enabled:
        yield
        return
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
