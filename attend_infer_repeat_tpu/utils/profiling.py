"""Profiling: jax.profiler traces and step timing (SURVEY §6 tracing row).

``trace(logdir)`` captures a TensorBoard-viewable device trace (works on
TPU; open with tensorboard-plugin-profile).  ``StepTimer`` measures steady
-state step walls with ``block_until_ready`` fences, the honest way to
time dispatch-pipelined JAX programs.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str, annotate: Optional[str] = None):
    """Capture a profiler trace of the enclosed block into ``logdir``."""
    ctx = jax.profiler.trace(logdir)
    with ctx:
        if annotate:
            with jax.profiler.TraceAnnotation(annotate):
                yield
        else:
            yield


class StepTimer:
    """Wall-clock step timer with warmup discard and device fencing."""

    def __init__(self, n_warmup: int = 3):
        self.n_warmup = n_warmup
        self._times = []
        self._count = 0
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        """Fence on ``result`` (if given) then record the elapsed wall."""
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.n_warmup:
            self._times.append(dt)
        return dt

    @property
    def mean_s(self) -> float:
        return sum(self._times) / max(len(self._times), 1)

    def images_per_sec(self, batch_size: int) -> float:
        return batch_size / self.mean_s if self._times else 0.0
