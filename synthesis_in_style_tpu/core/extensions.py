"""Standard trainer extensions (replaces pytorch_training's Snapshotter,
WandBLogger, LRScheduler-reporting, ImagePlotter, Evaluator — reference call
sites train.py:108-137, train_stylegan_2.py:127-180)."""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Callable, Dict, Optional

import jax
import numpy as np

from synthesis_in_style_tpu.core.trainer import Extension, Trainer

logger = logging.getLogger(__name__)


def _is_main_process() -> bool:
    return jax.process_index() == 0


class Snapshotter(Extension):
    """Periodically checkpoints a dict of named pytrees via orbax, preserving
    the reference's logical key layout (`generator`, `discriminator`, `g_ema`,
    `*_optimizer`, `segmentation_network`, ... — train_stylegan_2.py:154-165).

    `state_fn(trainer)` returns the {name: pytree} dict to save.
    """

    priority = 200

    def __init__(self, state_fn: Callable[[Trainer], Dict], log_dir, trigger):
        super().__init__(trigger)
        self.state_fn = state_fn
        self.checkpoint_dir = Path(log_dir) / "checkpoints"
        self._checkpointer = None

    def _get_checkpointer(self):
        if self._checkpointer is None:
            import orbax.checkpoint as ocp

            self._checkpointer = ocp.StandardCheckpointer()
        return self._checkpointer

    def run(self, trainer: Trainer):
        # EVERY process must call orbax save: in a multi-process runtime the
        # checkpointer synchronizes via global barriers and writes once from
        # the primary host — a rank-0-only call (the torch-DDP idiom,
        # reference base_train_builder.py:91-102) deadlocks rank 0 in the
        # save barrier while the other ranks run ahead (observed in
        # tests/test_multiprocess.py development)
        state = self.state_fn(trainer)
        state = jax.tree_util.tree_map(np.asarray, state)
        path = (self.checkpoint_dir / f"iter_{trainer.updater.iteration:08d}").resolve()
        self._get_checkpointer().save(path, state, force=True)
        self._last_saved_iteration = trainer.updater.iteration
        if _is_main_process():
            logger.info("snapshot saved to %s", path)

    def finalize(self, trainer: Trainer):
        # skip the final save when the trigger already wrote this iteration:
        # orbax force=True deletes-then-rewrites, so re-saving would put the
        # only final checkpoint at risk for the duration of the rewrite —
        # the exact window finalize exists to close
        if getattr(self, "_last_saved_iteration", None) != trainer.updater.iteration:
            self.run(trainer)
        if self._checkpointer is not None:
            self._checkpointer.wait_until_finished()


class LogWriter(Extension):
    """Drains the reporter window and appends means to `log.jsonl`; optionally
    forwards to wandb when available+enabled (reference WandBLogger,
    train.py:108-121)."""

    priority = 300

    def __init__(self, log_dir, trigger, use_wandb: bool = False, wandb_kwargs=None):
        super().__init__(trigger)
        self.log_path = Path(log_dir) / "log.jsonl"
        self.use_wandb = use_wandb
        self.wandb_kwargs = wandb_kwargs or {}
        self._wandb = None

    def initialize(self, trainer: Trainer):
        if self.use_wandb and _is_main_process():
            try:
                import wandb

                self._wandb = wandb
                wandb.init(**self.wandb_kwargs)
            except ImportError:
                logger.warning("wandb not available; falling back to jsonl only")

    def run(self, trainer: Trainer):
        means = trainer.reporter.flush()
        if not means:
            return
        means["iteration"] = trainer.updater.iteration
        means["epoch"] = trainer.updater.epoch
        try:
            # host RSS in the metric stream: a leak like the measured
            # 15 MB/iteration numpy-buffer growth (OOM-killed a 256px run
            # at 130 GB) shows up long before the OOM killer does
            with open("/proc/self/statm") as f:
                means["host/rss_gb"] = round(
                    int(f.read().split()[1]) * 4096 / 2**30, 3
                )
        except OSError:
            pass
        if _is_main_process():
            with open(self.log_path, "a") as f:
                f.write(json.dumps(means) + "\n")
            if self._wandb is not None:
                self._wandb.log(means, step=trainer.updater.iteration)

    def finalize(self, trainer: Trainer):
        self.run(trainer)
        if self._wandb is not None:
            self._wandb.finish()


class LRReporter(Extension):
    """Reports the current learning rate(s) from schedule fns."""

    priority = 150

    def __init__(self, schedules: Dict[str, Callable], trigger):
        super().__init__(trigger)
        self.schedules = schedules

    def run(self, trainer: Trainer):
        it = trainer.updater.iteration
        for name, sched in self.schedules.items():
            trainer.reporter.add_observation(
                {name: float(np.asarray(sched(it)))}, prefix="lr"
            )


class ImagePlotter(Extension):
    """Renders a fixed probe set through `render_fn(trainer) -> uint8 HWC
    image` and writes PNGs under `<log_dir>/images` (reference ImagePlotter
    subclasses, SURVEY §2.8)."""

    priority = 400

    def __init__(self, render_fn: Callable[[Trainer], np.ndarray], log_dir, trigger):
        super().__init__(trigger)
        self.render_fn = render_fn
        self.image_dir = Path(log_dir) / "images"

    def run(self, trainer: Trainer):
        # render on EVERY process: render_fn typically applies the model to
        # state living on the global mesh, and a multi-host computation must
        # be dispatched by all hosts (gating it to rank 0 would hang the
        # others); only rank 0 writes the file
        image = np.asarray(self.render_fn(trainer))
        if not _is_main_process():
            return
        self.image_dir.mkdir(parents=True, exist_ok=True)
        from PIL import Image

        Image.fromarray(image).save(
            self.image_dir / f"iter_{trainer.updater.iteration:08d}.png"
        )


class Evaluator(Extension):
    """Runs `eval_fn(trainer) -> dict of scalars` and reports under an
    `evaluation` prefix (reference Evaluator + FIDScore extensions)."""

    priority = 250

    def __init__(self, eval_fn: Callable[[Trainer], Dict[str, float]], trigger,
                 prefix: str = "evaluation"):
        super().__init__(trigger)
        self.eval_fn = eval_fn
        self.prefix = prefix

    def run(self, trainer: Trainer):
        metrics = self.eval_fn(trainer)
        if metrics:
            trainer.reporter.add_observation(metrics, prefix=self.prefix)
            # expose the latest eval to same-cadence monitors (DivergenceAlarm
            # runs at a later priority and reads this instead of re-evaluating)
            trainer.last_evaluation = {
                "iteration": trainer.updater.iteration,
                **{k: float(v) for k, v in metrics.items()},
            }

    def finalize(self, trainer: Trainer):
        self.run(trainer)


class TrainingDiverged(RuntimeError):
    """Raised by DivergenceAlarm(abort=True); the Trainer's finally block
    still finalizes snapshots/log flushes on the way out."""


class DivergenceAlarm(Extension):
    """Live generator-quality monitor with a collapse/divergence alarm.

    The round-4 256px GAN run mode-collapsed ~2k iterations in and burned
    1.8 h undetected (MEASUREMENTS.md "256px trained-GAN attempt") — the
    reference's only quality loop is a human reading FIDScore logs
    (reference extensions/fid_score.py:16-39). This extension watches two
    measured collapse signatures every trigger firing:

    * ``fid_divergence``: the FID evaluator's relative-FID trend rises for
      ``fid_rising_evals`` consecutive evaluations (same pinned embedding =>
      relative comparisons are meaningful, scripts/fid_trend.py).
    * ``d_collapse``: the mean train/discriminator_loss of the current
      reporter window stays below ``d_loss_eps`` for ``d_loss_checks``
      consecutive checks — the r4 collapse ran d_loss 0.003-0.006 (vs
      g_loss 6.6-6.9) while healthy runs settle at 0.01-0.03.

    On alarm: logs loudly, writes ``alarm.json`` under the run's log dir,
    reports ``alarm/<kind>``; with ``abort=True`` raises TrainingDiverged.
    """

    priority = 260  # after Evaluator (250): sees this firing's FID

    def __init__(self, trigger, log_dir=None, fid_key: str = "fid_score",
                 d_loss_key: str = "train/discriminator_loss",
                 fid_rising_evals: int = 4, d_loss_eps: float = 0.008,
                 d_loss_checks: int = 6, warmup_iterations: int = 500,
                 abort: bool = False):
        super().__init__(trigger)
        self.log_dir = Path(log_dir) if log_dir else None
        self.fid_key = fid_key
        self.d_loss_key = d_loss_key
        self.fid_rising_evals = int(fid_rising_evals)
        self.d_loss_eps = float(d_loss_eps)
        self.d_loss_checks = int(d_loss_checks)
        self.warmup_iterations = int(warmup_iterations)
        # abort: bool (all kinds) or a list of kinds — e.g. ["d_collapse"]
        # aborts on the unambiguous collapse signature while a late-training
        # FID drift (observed live: a 4-eval rise at the noise floor of the
        # pinned embedding) only logs
        self.abort = (
            abort if isinstance(abort, (list, tuple, set)) else bool(abort)
        )
        self.fid_history: list = []
        self._low_d_streak = 0
        self._seen_eval_iteration = -1

    def _window_mean(self, trainer: Trainer, key: str) -> Optional[float]:
        """Mean of the CURRENT (undrained) reporter window for `key` —
        peeks without clearing so the LogWriter's flush is untouched."""
        values = trainer.reporter._values.get(key)
        if not values:
            return None
        host = jax.device_get(list(values))
        return float(np.mean([float(v) for v in host]))

    def _fire(self, trainer: Trainer, kind: str, detail: dict):
        logger.error("DIVERGENCE ALARM [%s] at iteration %d: %s",
                     kind, trainer.updater.iteration, detail)
        print(f"*** DIVERGENCE ALARM [{kind}] at iteration "
              f"{trainer.updater.iteration}: {detail} ***", flush=True)
        trainer.reporter.add_observation({kind: 1.0}, prefix="alarm")
        if self.log_dir and _is_main_process():
            self.log_dir.mkdir(parents=True, exist_ok=True)
            (self.log_dir / "alarm.json").write_text(json.dumps({
                "kind": kind, "iteration": trainer.updater.iteration,
                "detail": detail, "fid_history": self.fid_history,
            }))
        should_abort = (
            kind in self.abort
            if isinstance(self.abort, (list, tuple, set)) else self.abort
        )
        if should_abort:
            raise TrainingDiverged(f"{kind} at iteration "
                                   f"{trainer.updater.iteration}: {detail}")

    def run(self, trainer: Trainer):
        it = trainer.updater.iteration
        last_eval = getattr(trainer, "last_evaluation", None)
        if (last_eval is not None and self.fid_key in last_eval
                and last_eval["iteration"] > self._seen_eval_iteration):
            self._seen_eval_iteration = last_eval["iteration"]
            self.fid_history.append(
                [last_eval["iteration"], float(last_eval[self.fid_key])]
            )
            n = self.fid_rising_evals
            if len(self.fid_history) > n:
                tail = [f for _, f in self.fid_history[-(n + 1):]]
                if all(b > a for a, b in zip(tail, tail[1:])):
                    self._fire(trainer, "fid_divergence", {
                        "rising_evals": n, "fid_tail": tail})

        if it >= self.warmup_iterations:
            d_mean = self._window_mean(trainer, self.d_loss_key)
            if d_mean is not None:
                self._low_d_streak = (
                    self._low_d_streak + 1 if d_mean < self.d_loss_eps else 0
                )
                if self._low_d_streak >= self.d_loss_checks:
                    streak = self._low_d_streak
                    self._low_d_streak = 0
                    self._fire(trainer, "d_collapse", {
                        "window_mean_d_loss": d_mean,
                        "eps": self.d_loss_eps, "checks": streak})
