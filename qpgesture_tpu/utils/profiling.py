"""Profiling & tracing subsystem.

The reference has none (SURVEY §5: tqdm + manual ETA arithmetic). Here:
phase-scoped wall timers with a structured report, and a jax.profiler trace
context for TPU timeline capture.
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, Iterator, Optional


@dataclass
class Profiler:
    """Nested phase timers: with prof.phase('match'): ..."""
    totals: Dict[str, float] = field(default_factory=lambda: defaultdict(float))
    counts: Dict[str, int] = field(default_factory=lambda: defaultdict(int))
    _stack: list = field(default_factory=list)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        label = "/".join(self._stack + [name])
        self._stack.append(name)
        start = time.perf_counter()
        try:
            yield
        finally:
            self._stack.pop()
            self.totals[label] += time.perf_counter() - start
            self.counts[label] += 1

    def report(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": round(self.totals[k], 4),
                    "count": self.counts[k],
                    "mean_s": round(self.totals[k] / self.counts[k], 4)}
                for k in sorted(self.totals)}

    def dump(self, path: Optional[str] = None) -> str:
        text = json.dumps(self.report(), indent=2)
        if path:
            with open(path, "w") as f:
                f.write(text)
        return text


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace for TensorBoard/XProf timeline capture."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block_and_time(fn, *args, n: int = 1, **kwargs):
    """Time a device function with proper synchronization; returns
    (result, seconds_per_call)."""
    import jax
    result = fn(*args, **kwargs)
    jax.block_until_ready(result)
    start = time.perf_counter()
    for _ in range(n):
        result = fn(*args, **kwargs)
        jax.block_until_ready(result)
    return result, (time.perf_counter() - start) / n
