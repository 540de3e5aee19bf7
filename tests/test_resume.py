"""Preemption auto-resume (VERDICT r3 #8): `--resume-ckpt latest` snapshot
discovery, full-state restore (weights + optimizer + iteration + data
position), and kill-at-iteration-k => resume => SAME final state as a
straight-through run.

Bit-exact resume rests on three deterministic pieces:
* the loader's per-(seed, epoch) shuffle + `seek(iteration)` (data/loader.py),
* the updater RNG re-keyed from (seed, iteration) every step (core/updater.py),
* snapshots carrying the optimizer state (core/extensions.Snapshotter).

The reference has no preemption handling at all (SURVEY §5 "no preemption
handling, no elastic world-size, no torchrun").
"""

import json

import numpy as np
import pytest
import yaml
from PIL import Image

from synthesis_in_style_tpu.utils.checkpoint import (
    discover_latest_snapshot,
    latest_snapshot,
    load_pytree,
    snapshot_iteration,
)

pytestmark = pytest.mark.slow  # excluded from the quick lane (-m 'not slow')


def test_loader_seek_replays_exact_stream():
    from synthesis_in_style_tpu.data.loader import DataLoader

    data = list(range(23))
    loader = DataLoader(data, batch_size=4, num_workers=1, seed=3,
                        collate_fn=lambda xs: list(xs))
    straight = [tuple(b) for _, b in zip(range(12), loader.infinite())]

    resumed_loader = DataLoader(data, batch_size=4, num_workers=1, seed=3,
                                collate_fn=lambda xs: list(xs))
    resumed_loader.seek(7)
    resumed = [tuple(b) for _, b in zip(range(5), resumed_loader.infinite())]
    assert resumed == straight[7:]


def test_discover_latest_snapshot(tmp_path):
    root = tmp_path / "logs" / "run" / "name"
    old = root / "2026-01-01T00:00:00" / "checkpoints"
    new = root / "2026-01-02T00:00:00" / "checkpoints"
    old.mkdir(parents=True)
    new.mkdir(parents=True)
    (old / "iter_00000100").mkdir()
    (new / "iter_00000050").mkdir()
    found = discover_latest_snapshot(root)
    # highest ITERATION wins, regardless of which attempt wrote it
    assert found == old / "iter_00000100"
    assert snapshot_iteration(found) == 100
    assert discover_latest_snapshot(tmp_path / "nothing") is None


def _seg_fixture(tmp_path):
    class_to_color = {
        "background": "#000000",
        "printed_text": "#0000FF",
        "handwritten_text": "#FF0000",
    }
    colors_path = tmp_path / "colors.json"
    colors_path.write_text(json.dumps(class_to_color))
    rng = np.random.default_rng(0)
    files = []
    for i in range(4):
        img = rng.integers(0, 255, (32, 32, 3), np.uint8)
        mask = np.zeros((32, 32, 3), np.uint8)
        mask[8:24, 8:24] = (0, 0, 255)
        Image.fromarray(np.concatenate([img, mask], axis=1)).save(
            tmp_path / f"im_{i}.png"
        )
        files.append({"file_name": f"im_{i}.png"})
    (tmp_path / "train.json").write_text(json.dumps(files))
    return colors_path


def _seg_config(tmp_path, max_iter, snapshot_save_iter):
    config = {
        "network": "DocUFCN", "dataset": "wpi", "num_classes": 3,
        "image_size": 32, "batch_size": 2, "num_augmentations": 1,
        "num_workers": 1, "lr": 1e-3, "beta1": 0.9, "beta2": 0.999,
        "weight_decay": 0.0, "end_lr": 1e-5, "max_iter": max_iter,
        "snapshot_save_iter": snapshot_save_iter, "image_save_iter": 100,
        "log_iter": 1, "display_size": 2,
        "class_weights": [1.0, 1.0, 1.0], "epochs": 1,
    }
    path = tmp_path / f"config_{max_iter}.yaml"
    path.write_text(yaml.dump(config))
    return path


def _run_seg(tmp_path, colors_path, config_path, log_dir, resume=None):
    from synthesis_in_style_tpu.cli import train as train_cli

    argv = [str(config_path), "--images", str(tmp_path / "train.json"),
            "--class-to-color-map", str(colors_path), "--debug"]
    if resume:
        argv += ["--resume-ckpt", resume]
    args = train_cli.build_parser().parse_args(argv)
    args.log_dir = str(log_dir)
    train_cli.main(args)
    return latest_snapshot(log_dir / "checkpoints")


def _leaves(tree):
    import jax

    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def _kill_after(monkeypatch, updater_cls, iterations: int):
    """Simulate preemption: SIGINT-style interrupt mid-run after N
    iterations. The trainer's finally-block finalizers still run, so the
    Snapshotter writes the preemption snapshot — the same state an external
    SIGTERM handler or periodic snapshot would have left behind."""
    original = updater_cls.update

    def update(self):
        if self.iteration >= iterations:
            raise KeyboardInterrupt("preempted")
        original(self)

    monkeypatch.setattr(updater_cls, "update", update)
    return original


def test_seg_kill_resume_equals_straight(tmp_path, monkeypatch):
    """Train 6 iterations straight vs kill-at-3 + preemption-resume:
    identical final network AND optimizer state. Both attempts run the SAME
    config — the LR schedule must line up across the kill."""
    from synthesis_in_style_tpu.updaters.segmentation_updater import (
        SegmentationUpdater,
    )

    colors = _seg_fixture(tmp_path)
    config = _seg_config(tmp_path, 6, 100)  # snapshots only via finalize

    straight_snap = _run_seg(
        tmp_path, colors, config,
        tmp_path / "logs" / "straight" / "run" / "t0",
    )

    # "killed" attempt: interrupted mid-run after 3 iterations
    root = tmp_path / "logs" / "resumed" / "run"
    original = _kill_after(monkeypatch, SegmentationUpdater, 3)
    with pytest.raises(KeyboardInterrupt):
        _run_seg(tmp_path, colors, config, root / "t0")
    monkeypatch.setattr(SegmentationUpdater, "update", original)
    killed_snap = latest_snapshot(root / "t0" / "checkpoints")
    assert snapshot_iteration(killed_snap) == 3
    # restarted attempt in a FRESH timestamp dir, discovers the snapshot
    resumed_snap = _run_seg(
        tmp_path, colors, config, root / "t1", resume="latest",
    )

    assert snapshot_iteration(straight_snap) == 6
    assert snapshot_iteration(resumed_snap) == 6
    a, b = load_pytree(straight_snap), load_pytree(resumed_snap)
    for la, lb in zip(_leaves(a["segmentation_network"]),
                      _leaves(b["segmentation_network"])):
        np.testing.assert_allclose(la, lb, rtol=1e-6, atol=1e-7)
    for la, lb in zip(_leaves(a["main_optimizer"]),
                      _leaves(b["main_optimizer"])):
        np.testing.assert_allclose(la, lb, rtol=1e-6, atol=1e-7)


def _gan_config(tmp_path, max_iter, snapshot_save_iter):
    config = {
        "image_size": 32, "latent_size": 32, "n_mlp": 2,
        "channel_multiplier": 1, "stylegan_variant": 2, "batch_size": 2,
        "lr": 2e-3, "max_iter": max_iter,
        "snapshot_save_iter": snapshot_save_iter,
        "image_save_iter": 100, "log_iter": 1, "num_workers": 1,
        "style_mixing_prob": 0.9,
        "regularization": {"g_interval": 4, "d_interval": 4,
                           "r1_weight": 10, "path_reg_weight": 2},
    }
    path = tmp_path / f"gan_config_{max_iter}.yaml"
    path.write_text(yaml.dump(config))
    return path


def _run_gan(tmp_path, config_path, log_dir, resume=None):
    from synthesis_in_style_tpu.cli import train_stylegan_2 as gan_cli

    argv = [str(config_path), "--images", str(tmp_path / "train.json"),
            "--debug"]
    if resume:
        argv += ["--resume-ckpt", resume]
    args = gan_cli.build_parser().parse_args(argv)
    args.log_dir = str(log_dir)
    gan_cli.main(args)
    return latest_snapshot(log_dir / "checkpoints")


def test_gan_kill_resume_equals_straight(tmp_path, monkeypatch):
    """GAN path: 4 straight vs kill-at-2 + resume — identical generator,
    EMA, discriminator, optimizer moments, and path-length running mean."""
    from synthesis_in_style_tpu.updaters.stylegan2_updater import (
        StyleGAN2Updater,
    )

    rng = np.random.default_rng(0)
    files = []
    for i in range(4):
        Image.fromarray(
            rng.integers(0, 255, (32, 32, 3), np.uint8)
        ).save(tmp_path / f"img_{i}.png")
        files.append(f"img_{i}.png")
    (tmp_path / "train.json").write_text(json.dumps(files))
    config = _gan_config(tmp_path, 4, 100)  # snapshots only via finalize

    straight_snap = _run_gan(
        tmp_path, config, tmp_path / "logs" / "straight" / "run" / "t0",
    )

    root = tmp_path / "logs" / "resumed" / "run"
    original = _kill_after(monkeypatch, StyleGAN2Updater, 2)
    with pytest.raises(KeyboardInterrupt):
        _run_gan(tmp_path, config, root / "t0")
    monkeypatch.setattr(StyleGAN2Updater, "update", original)
    killed_snap = latest_snapshot(root / "t0" / "checkpoints")
    assert snapshot_iteration(killed_snap) == 2
    resumed_snap = _run_gan(
        tmp_path, config, root / "t1", resume="latest"
    )

    assert snapshot_iteration(straight_snap) == 4
    assert snapshot_iteration(resumed_snap) == 4
    a, b = load_pytree(straight_snap), load_pytree(resumed_snap)
    for key in ("generator", "g_ema", "discriminator",
                "generator_optimizer", "discriminator_optimizer",
                "training_state"):
        for la, lb in zip(_leaves(a[key]), _leaves(b[key])):
            np.testing.assert_allclose(
                la, lb, rtol=1e-5, atol=1e-6, err_msg=key
            )
