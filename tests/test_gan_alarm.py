"""DivergenceAlarm (VERDICT r4 #3): the live collapse/divergence monitor
must fire on the RECORDED round-4 256px mode-collapse trajectory (d_loss
0.003-0.006 sustained while g_loss 6.6-6.9 — MEASUREMENTS.md "256px
trained-GAN attempt") and must stay quiet on the healthy round-2 soak
trajectory (d_loss settling 0.01-0.03) and on an improving FID trend
(the committed fid_trend.json direction)."""

import json

import pytest

from synthesis_in_style_tpu.core.extensions import (
    DivergenceAlarm,
    TrainingDiverged,
)
from synthesis_in_style_tpu.core.reporter import Reporter


class _Updater:
    def __init__(self):
        self.iteration = 0


class _Trainer:
    def __init__(self):
        self.reporter = Reporter()
        self.updater = _Updater()


def _run_d_loss_trajectory(alarm, trainer, d_losses, per_check=10):
    """Feed one reporter window per check (the CLI wires the alarm at epoch
    cadence over the undrained window), advancing the iteration counter."""
    fired = []
    for d in d_losses:
        for _ in range(per_check):
            trainer.reporter.add_observation(
                {"discriminator_loss": d}, prefix="train"
            )
        trainer.updater.iteration += per_check
        try:
            alarm.run(trainer)
        except TrainingDiverged as e:
            fired.append(e)
            break
        trainer.reporter._values.clear()  # LogWriter drains between checks
    return fired


def test_d_collapse_fires_on_recorded_r4_trajectory(tmp_path):
    # the r4 256px run: d_loss 0.003-0.006 from ~2k iterations on
    collapse = [0.8, 0.2, 0.05, 0.006, 0.004, 0.003, 0.005, 0.004,
                0.006, 0.003, 0.004, 0.005, 0.003, 0.004]
    alarm = DivergenceAlarm(trigger=None, log_dir=tmp_path,
                            warmup_iterations=30, abort=True)
    fired = _run_d_loss_trajectory(alarm, _Trainer(), collapse)
    assert fired, "recorded collapse trajectory must trip the alarm"
    assert "d_collapse" in str(fired[0])
    saved = json.loads((tmp_path / "alarm.json").read_text())
    assert saved["kind"] == "d_collapse"
    assert saved["detail"]["window_mean_d_loss"] < alarm.d_loss_eps


def test_d_collapse_quiet_on_healthy_soak_trajectory(tmp_path):
    # round-2 5k-iteration soak: d_loss settled ~0.01-0.03
    healthy = [0.9, 0.3, 0.08, 0.03, 0.02, 0.015, 0.01, 0.02, 0.03,
               0.012, 0.018, 0.025, 0.011, 0.02, 0.03, 0.016]
    alarm = DivergenceAlarm(trigger=None, log_dir=tmp_path,
                            warmup_iterations=30, abort=True)
    fired = _run_d_loss_trajectory(alarm, _Trainer(), healthy)
    assert not fired
    assert not (tmp_path / "alarm.json").exists()


def test_warmup_suppresses_early_checks(tmp_path):
    alarm = DivergenceAlarm(trigger=None, log_dir=tmp_path,
                            warmup_iterations=10_000, abort=True)
    fired = _run_d_loss_trajectory(alarm, _Trainer(), [0.001] * 20)
    assert not fired  # all checks inside warmup


def _run_fid_trajectory(alarm, trainer, fids):
    fired = []
    for i, f in enumerate(fids):
        trainer.updater.iteration = (i + 1) * 100
        trainer.last_evaluation = {
            "iteration": trainer.updater.iteration, "fid_score": f
        }
        try:
            alarm.run(trainer)
        except TrainingDiverged as e:
            fired.append(e)
            break
    return fired


def test_fid_divergence_fires_on_sustained_rise(tmp_path):
    alarm = DivergenceAlarm(trigger=None, log_dir=tmp_path,
                            fid_rising_evals=4, abort=True)
    rising = [0.001, 0.0009, 0.0011, 0.0013, 0.0016, 0.0020, 0.0025]
    fired = _run_fid_trajectory(alarm, _Trainer(), rising)
    assert fired and "fid_divergence" in str(fired[0])


def test_fid_quiet_on_improving_trend(tmp_path):
    # the committed fid_trend.json direction: 0.00257 -> 0.00167 -> 0.00087
    alarm = DivergenceAlarm(trigger=None, log_dir=tmp_path,
                            fid_rising_evals=4, abort=True)
    improving = [0.00257, 0.00201, 0.00167, 0.00122, 0.00087, 0.00085]
    fired = _run_fid_trajectory(alarm, _Trainer(), improving)
    assert not fired
    # noisy-but-flat must not fire either (needs N CONSECUTIVE rises)
    noisy = [0.001, 0.0011, 0.0009, 0.0012, 0.001, 0.0011, 0.0009]
    fired = _run_fid_trajectory(
        DivergenceAlarm(trigger=None, fid_rising_evals=4, abort=True),
        _Trainer(), noisy)
    assert not fired


def test_no_abort_reports_and_continues(tmp_path):
    alarm = DivergenceAlarm(trigger=None, log_dir=tmp_path,
                            warmup_iterations=0, abort=False)
    trainer = _Trainer()
    fired = _run_d_loss_trajectory(alarm, trainer, [0.001] * 12)
    assert not fired  # no exception with abort=False
    assert (tmp_path / "alarm.json").exists()


def test_cli_wires_alarm_by_default():
    """The GAN CLI must install the alarm unless quality_alarm.enabled is
    false (VERDICT r4 #3 'on by default in the GAN CLIs')."""
    src = open("synthesis_in_style_tpu/cli/train_stylegan_2.py").read()
    assert "DivergenceAlarm" in src
    src2 = open(
        "synthesis_in_style_tpu/cli/train_adversarial_generator.py"
    ).read()
    assert "DivergenceAlarm" in src2


def test_abort_kinds_selective(tmp_path):
    """abort=["d_collapse"] must raise on collapse but only log on FID
    divergence (the observed live false-positive mode: a monotone rise at
    the pinned embedding's noise floor)."""
    alarm = DivergenceAlarm(trigger=None, log_dir=tmp_path,
                            fid_rising_evals=4, warmup_iterations=30,
                            abort=["d_collapse"])
    trainer = _Trainer()
    fired = _run_fid_trajectory(
        alarm, trainer, [0.001, 0.0011, 0.0012, 0.0013, 0.0014, 0.0015])
    assert not fired  # logged, not raised
    assert (tmp_path / "alarm.json").exists()
    fired = _run_d_loss_trajectory(alarm, trainer, [0.001] * 12)
    assert fired and "d_collapse" in str(fired[0])
