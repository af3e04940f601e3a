"""Profiling & step-timing hooks — the tracing subsystem the reference
lacks entirely (SURVEY.md §5: only wall-clock logging exists there).

Two layers:
  * `trace(logdir)` — context manager around `jax.profiler` emitting a
    TensorBoard-compatible device trace (XLA ops, Pallas kernels, HBM
    transfers);
  * `StepTimer` — lightweight host-side rolling statistics for training /
    generation loops, matching the reference's "sec/batch with ETA"
    reporting (qpnet_train.py:534-545) but kept as a reusable object.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Optional


@contextlib.contextmanager
def trace(logdir: str, with_python: bool = False):
    """Capture a jax.profiler device trace into `logdir`."""
    import jax
    jax.profiler.start_trace(logdir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logging.info("profiler trace written to %s", logdir)


def annotate(name: str):
    """Named trace span (shows up in the profiler timeline)."""
    import jax
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling per-step timing with ETA, reported every `interval` steps."""

    def __init__(self, total_steps: int, interval: int = 100,
                 name: str = "train"):
        self.total = total_steps
        self.interval = interval
        self.name = name
        self._t0: Optional[float] = None
        self._acc = 0.0
        self._count = 0
        self.history = []

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._acc += time.perf_counter() - self._t0
        self._count += 1
        if self._count % self.interval == 0:
            sec = self._acc / self.interval
            eta = int((self.total - self._count) * sec)
            logging.info("[%s] step %d/%d: %.3f sec/step, ETA "
                         "%02d:%02d:%02d", self.name, self._count,
                         self.total, sec,
                         eta // 3600, (eta % 3600) // 60, eta % 60)
            self.history.append(sec)
            self._acc = 0.0
        return False


def device_memory_stats() -> dict:
    """Per-device HBM usage snapshot (bytes), when the backend exposes it."""
    import jax
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
            out[str(d)] = {k: stats[k] for k in
                           ("bytes_in_use", "peak_bytes_in_use",
                            "bytes_limit") if k in stats}
        except Exception:
            out[str(d)] = {}
    return out
