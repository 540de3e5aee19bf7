"""Core substrate tests: triggers, reporter, trainer loop + extensions,
config merge/discovery, LR schedules."""

import argparse
import json

import numpy as np
import pytest

from synthesis_in_style_tpu.core import (
    IntervalTrigger,
    Reporter,
    Trainer,
    Updater,
    get_trigger,
)
from synthesis_in_style_tpu.core.config import (
    get_config_dir_from_checkpoint,
    load_config_from_checkpoint,
    merge_config_and_args,
    save_run_config,
)
from synthesis_in_style_tpu.core.schedules import (
    clamped_cosine,
    cosine_warm_restarts,
)
from synthesis_in_style_tpu.core.trainer import Extension, StopTrigger


class CountingUpdater(Updater):
    def __init__(self):
        super().__init__({})
        self.calls = 0

    def update_core(self):
        self.calls += 1
        self.report({"loss": float(self.calls)}, prefix="train")


class RecordingExtension(Extension):
    def __init__(self, trigger):
        super().__init__(trigger)
        self.fired_at = []

    def run(self, trainer):
        self.fired_at.append(trainer.updater.iteration)


def test_trainer_loop_and_triggers(tmp_path):
    updater = CountingUpdater()
    trainer = Trainer(updater, (10, "iteration"), log_dir=tmp_path)
    ext = RecordingExtension((3, "iteration"))
    trainer.extend(ext)
    trainer.train()
    assert updater.calls == 10
    assert ext.fired_at == [3, 6, 9]


def test_stop_trigger_epoch():
    class EpochUpdater(CountingUpdater):
        @property
        def epoch(self):
            return self.calls // 4

    updater = EpochUpdater()
    trainer = Trainer(updater, (2, "epoch"))
    trainer.train()
    assert updater.calls == 8


def test_reporter_window_means():
    r = Reporter()
    r.add_observation({"a": 1.0}, prefix="train")
    r.add_observation({"a": 3.0}, prefix="train")
    means = r.flush()
    assert means == {"train/a": 2.0}
    assert r.flush() == {}


def test_merge_config_and_args():
    config = {"lr": 0.1, "batch_size": 8}
    args = argparse.Namespace(lr=0.5, extra="x", batch_size=None)
    merged = merge_config_and_args(config, args)
    assert merged["lr"] == 0.5  # args win
    assert merged["batch_size"] == 8  # None arg doesn't override
    assert merged["extra"] == "x"


def test_checkpoint_relative_config_discovery(tmp_path):
    run_dir = tmp_path / "run"
    save_run_config(run_dir, {"network": "doc_ufcn"}, argparse.Namespace(seed=7))
    ckpt = run_dir / "checkpoints" / "iter_00000010"
    ckpt.parent.mkdir(parents=True)
    ckpt.touch()
    assert get_config_dir_from_checkpoint(ckpt) == (run_dir / "config").resolve()
    config = load_config_from_checkpoint(ckpt)
    assert config["network"] == "doc_ufcn"
    assert config["seed"] == 7


def test_config_fallback_path(tmp_path):
    alt = tmp_path / "alt.json"
    alt.write_text(json.dumps({"network": "emanet"}))
    ckpt = tmp_path / "nowhere" / "checkpoints" / "c"
    config = load_config_from_checkpoint(ckpt, original_config_path=alt)
    assert config["network"] == "emanet"
    with pytest.raises(FileNotFoundError):
        load_config_from_checkpoint(ckpt)


def test_clamped_cosine_schedule():
    sched = clamped_cosine(1.0, t_max=100, eta_min=0.1)
    assert float(sched(0)) == pytest.approx(1.0)
    assert float(sched(100)) == pytest.approx(0.1)
    assert float(sched(500)) == pytest.approx(0.1)  # clamped after T_max


def test_warm_restarts_schedule():
    sched = cosine_warm_restarts(1.0, t_0=10)
    assert float(sched(0)) == pytest.approx(1.0)
    assert float(sched(10)) == pytest.approx(1.0)  # restart
    assert float(sched(5)) < 1.0


def test_profiling_harness(tmp_path):
    import jax.numpy as jnp

    from synthesis_in_style_tpu.utils.profiling import StepTimer, trace

    timer = StepTimer()
    with trace(tmp_path / "trace"):
        for _ in range(3):
            timer.start()
            x = jnp.ones((64, 64)) @ jnp.ones((64, 64))
            timer.stop(fetch=x)
    summary = timer.summary()
    assert summary["steps"] == 3 and summary["total_s"] > 0
    # the profiler wrote a trace directory
    assert any((tmp_path / "trace").rglob("*"))
