"""Profiling / observability helpers.

The reference's only observability is timestamped prints, per-epoch
wall-times and psutil RSS dumps (io_utils.py:52-55, callbacks.py:17-34,
56-67). TPU-native equivalents:

* ``trace(logdir)`` — context manager around ``jax.profiler`` producing an
  xprof/tensorboard trace of everything inside.
* ``annotate(name)`` — TraceAnnotation so custom spans show in the trace.
* ``memory_stats()`` — host RSS (psutil like the reference) + per-device
  HBM stats from ``jax.local_devices()[i].memory_stats()``.
* ``StepTimer`` — cheap wall-clock step timing with EMA, for CSV logs.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


def memory_stats() -> dict:
    out = {}
    try:
        import psutil

        out["host_rss_mb"] = psutil.Process().memory_info().rss / 1e6
    except Exception:
        pass
    try:
        import jax

        for i, d in enumerate(jax.local_devices()):
            stats = d.memory_stats()
            if stats:
                out[f"dev{i}_bytes_in_use_mb"] = stats.get("bytes_in_use", 0) / 1e6
                out[f"dev{i}_peak_bytes_mb"] = stats.get("peak_bytes_in_use", 0) / 1e6
    except Exception:
        pass
    return out


class StepTimer:
    """EMA step timer; ``update()`` per step, read ``.rate`` (steps/s)."""

    def __init__(self, alpha: float = 0.1):
        self._alpha = alpha
        self._last = None
        self._ema = None

    def update(self) -> float | None:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self._ema = dt if self._ema is None else (1 - self._alpha) * self._ema + self._alpha * dt
        self._last = now
        return self._ema

    @property
    def rate(self) -> float | None:
        return None if not self._ema else 1.0 / self._ema
