"""Interval triggers for trainer extensions.

Replicates the `pytorch_training.triggers.get_trigger((N, 'iteration'|'epoch'))`
contract observed at reference call sites (train.py:99-106,
train_stylegan_2.py:154-180)."""

from __future__ import annotations

from typing import Tuple


class IntervalTrigger:
    """Fires every `period` iterations or epochs."""

    def __init__(self, period: int, unit: str):
        assert unit in ("iteration", "epoch"), unit
        assert period > 0
        self.period = period
        self.unit = unit
        self._last_epoch_fire = -1

    def __call__(self, trainer) -> bool:
        updater = trainer.updater
        if self.unit == "iteration":
            return updater.iteration > 0 and updater.iteration % self.period == 0
        epoch = updater.epoch
        if epoch != self._last_epoch_fire and epoch > 0 and epoch % self.period == 0:
            self._last_epoch_fire = epoch
            return True
        return False

    def __repr__(self):
        return f"IntervalTrigger({self.period}, {self.unit!r})"


def get_trigger(spec: Tuple[int, str] | IntervalTrigger | None):
    if spec is None:
        return None
    if isinstance(spec, IntervalTrigger):
        return spec
    period, unit = spec
    return IntervalTrigger(period, unit)
