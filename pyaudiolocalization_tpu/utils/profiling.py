"""Lightweight tracing/profiling hooks (SURVEY.md §5.1 — the reference has
none; the rebuild provides stage annotations + throughput counters).

Two layers:
  * ``stage(name)`` — host-side context manager that both opens a
    ``jax.profiler.TraceAnnotation`` (visible in a captured profiler trace /
    TensorBoard) and accumulates wall-clock per stage name in a process-wide
    registry.  Device work is asynchronous, so wall times measure *enqueue +
    any sync the stage itself performs*; wrap a blocking fetch to time real
    device work.
  * ``jax.named_scope`` labels inside jitted code (used by the estimation
    core) so stages are identifiable in XLA/HLO dumps and profiler traces.

``trace_to(dir)`` wraps ``jax.profiler.trace`` for full on-device traces.
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax

_lock = threading.Lock()
_totals: Dict[str, float] = defaultdict(float)
_counts: Dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def stage(name: str) -> Iterator[None]:
    """Annotate + time a pipeline stage."""
    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    dt = time.perf_counter() - t0
    with _lock:
        _totals[name] += dt
        _counts[name] += 1


def report() -> Dict[str, Dict[str, float]]:
    """{stage: {'total_s', 'calls', 'mean_s'}} accumulated so far."""
    with _lock:
        return {
            name: {
                "total_s": _totals[name],
                "calls": _counts[name],
                "mean_s": _totals[name] / max(_counts[name], 1),
            }
            for name in sorted(_totals)
        }


def reset() -> None:
    with _lock:
        _totals.clear()
        _counts.clear()


class ThroughputCounter:
    """Scenes/sec (or pairs/sec) counter for sweep loops."""

    def __init__(self) -> None:
        self._items = 0
        self._start = time.perf_counter()

    def add(self, n: int) -> None:
        self._items += n

    @property
    def per_second(self) -> float:
        dt = time.perf_counter() - self._start
        return self._items / dt if dt > 0 else 0.0


@contextlib.contextmanager
def trace_to(log_dir: str) -> Iterator[None]:
    """Capture a full device profile into ``log_dir`` (TensorBoard format)."""
    with jax.profiler.trace(log_dir):
        yield
