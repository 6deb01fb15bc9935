"""Tracing / profiling instrumentation.

The reference has only wall-clock prints (offline_train_runner.py:136-143,161) and
psutil gauges (SURVEY §5). Here: structured step timers feeding the LogWriter, an
optional jax.profiler trace context, and host resource gauges.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional



class StepTimer:
    """Named wall-clock accumulators with EMA; cheap enough for the hot loop."""

    def __init__(self, ema: float = 0.98):
        self._ema = ema
        self._avg: Dict[str, float] = {}
        self._last: Dict[str, float] = {}
        self._counts = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._last[name] = dt
            self._counts[name] += 1
            prev = self._avg.get(name)
            self._avg[name] = dt if prev is None else (
                self._ema * prev + (1 - self._ema) * dt)

    def last(self, name: str) -> float:
        return self._last.get(name, 0.0)

    def summary(self) -> Dict[str, float]:
        return {f"time/{k}_s": v for k, v in self._avg.items()}


@contextlib.contextmanager
def device_trace(logdir: Optional[str]):
    """jax.profiler trace when a logdir is given (view with TensorBoard)."""
    if not logdir:
        yield
        return
    import jax

    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


def host_gauges() -> Dict[str, float]:
    """psutil memory/CPU gauges (offline_train_runner.py:127-155)."""
    out: Dict[str, float] = {}
    try:
        import psutil

        # one cached Process: cpu_percent(interval=None) diffs against the
        # PREVIOUS call on the same instance — a fresh instance per call
        # returns a meaningless 0.0 forever
        global _PSUTIL_PROC
        if _PSUTIL_PROC is None:
            _PSUTIL_PROC = psutil.Process()
        out["host/rss_gb"] = _PSUTIL_PROC.memory_info().rss / 1e9
        out["host/cpu_percent"] = _PSUTIL_PROC.cpu_percent(interval=None)
        vm = psutil.virtual_memory()
        out["host/mem_used_frac"] = vm.percent / 100.0
    except ImportError:
        pass
    return out


_PSUTIL_PROC = None
