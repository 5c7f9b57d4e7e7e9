"""Profiling / tracing hooks.

The reference has no tracing at all (SURVEY §5: only
CUDA_LAUNCH_BLOCKING + tqdm); here we expose the JAX profiler so any
training or eval run can capture a device trace viewable in
TensorBoard/Perfetto, plus a lightweight step timer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax

from .logger import logger


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace for the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info(f"profiler trace written to {log_dir}")


class StepTimer:
    """Rolling throughput/latency tracker for the train loop."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    @property
    def mean_step_time(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0

    def throughput(self, batch_size: int) -> float:
        st = self.mean_step_time
        return batch_size / st if st else 0.0
