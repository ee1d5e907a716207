"""Tracing and per-phase timing.

The reference has no profiling at all (SURVEY.md §5.1 — an unused ``time``
import is the closest artifact). Here the north-star metric is
node-evals/sec/chip, so timing is first-class:

* :class:`PhaseTimer` — wall-clock accumulation per named phase with
  device-sync semantics (``block_until_ready`` on the phase's outputs, so the
  numbers measure device work, not dispatch).
* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard/XProf trace directory for kernel-level inspection.
* :func:`annotate` — ``jax.profiler.TraceAnnotation`` wrapper so phases show
  up named inside the device trace.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any, Dict, Iterator

import jax


class PhaseTimer:
    """Accumulates wall-clock seconds per named phase.

    Usage::

        timer = PhaseTimer()
        with timer.phase("evaluate"):
            fitness = eval_fn(pop)      # outputs synced on exit
        print(timer.summary())
    """

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._live: Any = None

    @contextlib.contextmanager
    def phase(self, name: str, sync: Any = None) -> Iterator[None]:
        """Time a block. ``sync`` (optional) is block_until_ready'd on exit —
        pass the phase's output arrays for accurate device timing."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def record(self, name: str, seconds: float) -> None:
        self.totals[name] += seconds
        self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_s": self.totals[name] / max(self.counts[name], 1),
            }
            for name in self.totals
        }

    def __str__(self) -> str:
        lines = ["phase                       total      n      mean"]
        for name, s in sorted(self.summary().items(), key=lambda kv: -kv[1]["total_s"]):
            lines.append(
                f"{name:<24} {s['total_s']:>9.3f}s {s['count']:>6d} {s['mean_s']:>9.4f}s"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace (open with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible inside device traces."""
    return jax.profiler.TraceAnnotation(name)
