"""Updater base: owns train state + per-iteration update logic.

Replaces the external `pytorch_training.Updater` contract (update_core(),
iterators, iteration counter — observed at reference updater call sites,
e.g. stylegan_2_updater.py:202-223, segmentation_updater.py:11-39).

JAX twist: instead of mutating networks/optimizers in place, an Updater holds
an immutable train-state pytree and jitted step functions; `update_core`
advances `self.state = step(self.state, batch, rng)`.
"""

from __future__ import annotations

import abc
from typing import Any, Dict, Iterator, Optional

import jax

from synthesis_in_style_tpu.core.reporter import get_current_reporter


class Updater(abc.ABC):
    def __init__(
        self,
        iterators: Optional[Dict[str, Iterator]] = None,
        seed: int = 0,
    ):
        self.iterators = iterators or {}
        self.iteration = 0
        self._base_rng = jax.random.PRNGKey(seed)
        self._rng = self._base_rng
        self.state: Any = None

    @property
    def epoch(self) -> int:
        it = self.iterators.get("images") or next(iter(self.iterators.values()), None)
        epoch_fn = getattr(it, "epoch", None)
        return int(epoch_fn) if epoch_fn is not None else 0

    def next_rng(self) -> jax.Array:
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def next_batch(self, name: str = "images"):
        return next(self.iterators[name])

    def update(self):
        # Re-key the RNG stream from (seed, iteration) every iteration: the
        # draws become a pure function of the iteration counter instead of
        # the split history, so a preemption resume at iteration k replays
        # the exact stream a straight-through run would have used
        # (cli --resume-ckpt latest; tests/test_resume.py).
        self._rng = jax.random.fold_in(self._base_rng, self.iteration)
        self.update_core()
        self.iteration += 1

    @abc.abstractmethod
    def update_core(self):
        ...

    def report(self, values, prefix: str = ""):
        get_current_reporter().add_observation(values, prefix)
