"""Profiling harness — the tracing capability the reference never had
(SURVEY.md §5: "Tracing/profiling: none ... jax.profiler traces +
block_until_ready timing harness are cheap wins")."""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Dict, Iterator, Optional, Union

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: Union[str, Path, None]) -> Iterator[None]:
    """Capture a jax.profiler trace (viewable in TensorBoard / Perfetto) for
    the enclosed region; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    log_dir = str(Path(log_dir))
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing that forces completion by fetching a scalar —
    `block_until_ready` alone is unreliable over remote-device relays."""

    def __init__(self):
        self.durations: list = []
        self._start: Optional[float] = None

    def start(self) -> None:
        self._start = time.perf_counter()

    def stop(self, fetch=None) -> float:
        if fetch is not None:
            np.asarray(fetch)  # force device completion
        assert self._start is not None, "start() first"
        duration = time.perf_counter() - self._start
        self.durations.append(duration)
        self._start = None
        return duration

    def summary(self) -> Dict[str, float]:
        if not self.durations:
            return {}
        arr = np.asarray(self.durations)
        return {
            "mean_s": float(arr.mean()),
            "median_s": float(np.median(arr)),
            "p90_s": float(np.percentile(arr, 90)),
            "total_s": float(arr.sum()),
            "steps": int(arr.size),
        }
