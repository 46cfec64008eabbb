"""Profiling helpers: jax.profiler traces + per-bucket step timing.

Rebuild of the reference's manual wall-clock accounting (SURVEY.md 5.1:
per-stage timers in ``api/infer.py:61-65,108-130``, validation timing,
memory probes) the TPU way: optional ``jax.profiler`` trace capture plus a
``StepTimer`` that aggregates per-bucket (per compiled program) step times
so compile time and steady-state throughput are visible separately.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Iterator


@contextlib.contextmanager
def trace(log_dir: str | None) -> Iterator[None]:
    """Capture a jax.profiler trace (viewable in TensorBoard/Perfetto)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-key (e.g. bucket shape) step timing with first-call isolation.

    The first call per key includes XLA compilation; it is recorded
    separately so steady-state throughput is not polluted.
    """

    def __init__(self) -> None:
        self.compile_s: dict = {}
        self.times: dict = defaultdict(list)
        self._t0: float | None = None
        self._key = None

    def start(self, key) -> None:
        self._key = key
        self._t0 = time.perf_counter()

    def stop(self) -> None:
        dt = time.perf_counter() - self._t0
        if self._key not in self.compile_s:
            self.compile_s[self._key] = dt
        else:
            self.times[self._key].append(dt)

    @contextlib.contextmanager
    def step(self, key) -> Iterator[None]:
        self.start(key)
        try:
            yield
        finally:
            self.stop()

    def summary(self) -> dict:
        out = {}
        for key, ts in self.times.items():
            out[str(key)] = {
                "compile_s": round(self.compile_s.get(key, 0.0), 3),
                "steps": len(ts),
                "mean_ms": round(1e3 * sum(ts) / max(len(ts), 1), 2),
                "min_ms": round(1e3 * min(ts), 2) if ts else None,
            }
        for key, c in self.compile_s.items():
            if key not in self.times:
                out[str(key)] = {"compile_s": round(c, 3), "steps": 0}
        return out

    def peak_memory_mb(self) -> float | None:
        """Device memory probe (reference api/infer.py:238-242 analog)."""
        try:
            import jax

            stats = jax.devices()[0].memory_stats()
            return stats.get("peak_bytes_in_use", 0) / 1e6
        except Exception:
            return None
