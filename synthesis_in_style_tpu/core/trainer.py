"""Trigger/extension training loop (replaces pytorch_training Trainer /
DistributedTrainer as used at reference train.py:103-142,
train_stylegan_2.py:127-183)."""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import List, Optional, Tuple, Union

from synthesis_in_style_tpu.core.reporter import Reporter
from synthesis_in_style_tpu.core.triggers import IntervalTrigger, get_trigger
from synthesis_in_style_tpu.core.updater import Updater

logger = logging.getLogger(__name__)


class Extension:
    """Base extension: callable fired on a trigger. Subclasses override
    `run(trainer)`; lower priority runs earlier."""

    priority: int = 100
    name: Optional[str] = None

    def __init__(self, trigger: Union[Tuple[int, str], IntervalTrigger, None] = None):
        self.trigger = get_trigger(trigger)

    def initialize(self, trainer: "Trainer"):
        pass

    def finalize(self, trainer: "Trainer"):
        pass

    def run(self, trainer: "Trainer"):
        raise NotImplementedError

    def __call__(self, trainer: "Trainer"):
        self.run(trainer)


class StopTrigger:
    """Stop after N iterations or epochs (reference get_trigger stop usage,
    train.py:99-106)."""

    def __init__(self, period: int, unit: str):
        assert unit in ("iteration", "epoch")
        self.period = period
        self.unit = unit

    def __call__(self, trainer) -> bool:
        if self.unit == "iteration":
            return trainer.updater.iteration >= self.period
        return trainer.updater.epoch >= self.period


class Trainer:
    def __init__(
        self,
        updater: Updater,
        stop_trigger: Union[Tuple[int, str], StopTrigger],
        log_dir: Union[str, Path, None] = None,
    ):
        self.updater = updater
        if isinstance(stop_trigger, tuple):
            stop_trigger = StopTrigger(*stop_trigger)
        self.stop_trigger = stop_trigger
        self.log_dir = Path(log_dir) if log_dir else None
        if self.log_dir:
            self.log_dir.mkdir(parents=True, exist_ok=True)
        self.extensions: List[Extension] = []
        self.reporter = Reporter()
        self.start_time: Optional[float] = None

    def extend(self, extension: Extension):
        self.extensions.append(extension)
        self.extensions.sort(key=lambda e: e.priority)
        return self

    def train(self):
        self.start_time = time.time()
        for ext in self.extensions:
            ext.initialize(self)
        try:
            import gc

            with self.reporter.scope():
                while not self.stop_trigger(self):
                    self.updater.update()
                    for ext in self.extensions:
                        if ext.trigger is None or ext.trigger(self):
                            ext(self)
                    # Large numpy batch buffers are invisible to the
                    # generational GC's allocation thresholds (few
                    # PyObjects, huge payloads): reference cycles can pin
                    # gigabytes for thousands of iterations. A measured
                    # 256px run leaked ~15 MB/iteration (one f32 batch)
                    # until the host OOM-killed it at 130 GB; an explicit
                    # periodic collect bounds that class of growth for ~ms
                    # of cost.
                    if self.updater.iteration % 200 == 0:
                        gc.collect()
        finally:
            # finalizers MUST run on crash/interrupt too: the snapshotter's
            # async orbax save has to be awaited (else a killed in-flight
            # write leaves a corrupt checkpoint), the last log window has to
            # flush, wandb has to finish
            for ext in self.extensions:
                try:
                    ext.finalize(self)
                except Exception:  # noqa: BLE001 — don't mask the original error
                    logger.exception("extension %r failed to finalize", ext)
        logger.info(
            "training finished after %d iterations in %.1fs",
            self.updater.iteration,
            time.time() - self.start_time,
        )
