"""Scalar observation aggregation (replaces pytorch_training's Reporter,
used by reference updaters e.g. stylegan_2_updater.py:205-221)."""

from __future__ import annotations

import threading
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict, Mapping

import numpy as np

_local = threading.local()


class Reporter:
    """Accumulates named scalar observations; loggers drain window means."""

    def __init__(self):
        self._values: Dict[str, list] = defaultdict(list)

    def add_observation(self, values: Mapping[str, float] | float, prefix: str = ""):
        """Store observations WITHOUT materializing device scalars — a
        `float()` here would force a device→host sync every training
        iteration, serializing the async dispatch pipeline (on a remote
        device link this dominated the whole step). Values stay as (possibly
        device) arrays until a logger drains them at its trigger interval."""
        if not isinstance(values, Mapping):
            values = {"value": values}
        for name, value in values.items():
            key = f"{prefix}/{name}" if prefix else name
            self._values[key].append(value)

    def flush(self) -> Dict[str, float]:
        # one batched device->host fetch for the whole window (per-scalar
        # np.asarray would pay a link round trip each)
        import jax

        host_values = jax.device_get({k: v for k, v in self._values.items() if v})
        means = {
            k: float(np.mean([float(x) for x in v]))
            for k, v in host_values.items()
        }
        self._values.clear()
        return means

    @contextmanager
    def scope(self):
        prev = getattr(_local, "reporter", None)
        _local.reporter = self
        try:
            yield self
        finally:
            _local.reporter = prev


def get_current_reporter() -> Reporter:
    reporter = getattr(_local, "reporter", None)
    if reporter is None:
        reporter = Reporter()
        _local.reporter = reporter
    return reporter
