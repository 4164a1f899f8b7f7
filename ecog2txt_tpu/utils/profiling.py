"""Profiling & observability.

The reference's only tracing is TensorBoard summaries routed through a
manifest key (SURVEY §5); the TPU-native replacements are:

* :func:`trace_to` — context manager around ``jax.profiler`` producing
  a TensorBoard-loadable trace of device execution;
* :class:`StepTimer` — wall-clock step/throughput counters
  (steps/s, sentences/s) with a forced device round-trip per lap so
  timings are real under async dispatch (and under the axon tunnel,
  where ``block_until_ready`` can return early — see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field


@contextlib.contextmanager
def trace_to(log_dir: str):
    """``with trace_to('/tmp/trace'): step(...)`` → profiler trace."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def force_result(tree) -> float:
    """Forced scalar round trip over one leaf — makes async work
    observable to wall-clock timers."""
    import jax
    import jax.numpy as jnp

    leaves = jax.tree.leaves(tree)
    if not leaves:
        return 0.0
    return float(jnp.sum(leaves[0]))


@dataclass
class StepTimer:
    """Accumulates (duration, items) laps; reports throughput."""

    laps: list = field(default_factory=list)
    _t0: float | None = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def lap(self, items: int = 1, result=None) -> float:
        if result is not None:
            force_result(result)
        if self._t0 is None:
            raise RuntimeError("call start() before lap()")
        dt = time.perf_counter() - self._t0
        self.laps.append((dt, items))
        self._t0 = time.perf_counter()
        return dt

    @property
    def total_seconds(self) -> float:
        return sum(d for d, _ in self.laps)

    @property
    def total_items(self) -> int:
        return sum(n for _, n in self.laps)

    @property
    def items_per_second(self) -> float:
        t = self.total_seconds
        return self.total_items / t if t > 0 else 0.0

    def summary(self) -> dict:
        durations = [d for d, _ in self.laps]
        return {
            "laps": len(self.laps),
            "total_s": self.total_seconds,
            "mean_lap_s": (
                sum(durations) / len(durations) if durations else 0.0
            ),
            "items_per_second": self.items_per_second,
        }
