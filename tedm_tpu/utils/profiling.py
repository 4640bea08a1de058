"""Profiling hooks — a capability the reference lacks entirely
(SURVEY §5: 'Tracing / profiling: none. Only tqdm progress bars').

* ``trace(log_dir)`` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace of the wrapped steps.
* ``StepTimer`` — wall-clock step-time / imgs-per-sec aggregator with
  percentiles, for the step-level counters the trainers log.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace if a directory is given, else no-op."""
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
    def __init__(self):
        self._times: List[float] = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
        self._last = now

    def stats(self, batch_size: int = 1) -> Dict[str, float]:
        if not self._times:
            return {}
        import numpy as np

        t = np.asarray(self._times)
        return {
            "perf/step_ms_p50": float(np.percentile(t, 50) * 1e3),
            "perf/step_ms_p95": float(np.percentile(t, 95) * 1e3),
            "perf/imgs_per_sec": float(batch_size / t.mean()),
        }

    def reset(self) -> None:
        self._times, self._last = [], None
