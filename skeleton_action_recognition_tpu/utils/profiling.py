"""Profiling helpers: trace-one-step pattern + step timers.

The reference's only profiling is a TensorBoard graph trace of one warm-up
train/test step (``tf.summary.trace_on`` at ``main_gnn.py:336-354``). The
TPU-native equivalents here:

* :func:`trace` — ``jax.profiler`` trace context producing a TensorBoard-
  compatible profile of whatever runs inside (used by ``main_gnn
  --profile-dir``);
* :class:`StepTimer` — wall-clock per-step statistics with a warm-up
  discard, robust to lazily-executing backends when the caller forces a
  host sync (e.g. fetching the loss).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import List


@contextlib.contextmanager
def trace(log_dir: str):
    """``jax.profiler.trace`` wrapper that degrades to a no-op when the
    backend doesn't support profiling (e.g. tunneled devices)."""
    import jax

    try:
        with jax.profiler.trace(log_dir):
            yield
    except Exception:
        yield


@dataclass
class StepTimer:
    warmup: int = 1
    _times: List[float] = field(default_factory=list)
    _t0: float = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._times.append(time.perf_counter() - self._t0)

    @property
    def steps(self) -> int:
        return max(len(self._times) - self.warmup, 0)

    def mean(self) -> float:
        timed = self._times[self.warmup :]
        return sum(timed) / len(timed) if timed else 0.0

    def rate(self, per_step_items: int) -> float:
        m = self.mean()
        return per_step_items / m if m > 0 else 0.0
