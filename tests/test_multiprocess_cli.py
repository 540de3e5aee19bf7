"""Production CLI mains under REAL multi-process jax.distributed
(VERDICT r3 #3): `cli.train.main()` and `cli.train_stylegan_2.main()`
end-to-end in 2 OS processes (4 virtual CPU devices each, one global
8-device mesh), snapshots into ONE shared log dir, then a
cross-process-count resume (2-proc snapshot -> 1-proc resume) whose
restored state round-trips identically.

The two round-3 MP production bugs (rank-0 orbax save deadlock, sharded
val loader crash) were found exactly at this integration layer with the
substrate-level tests green — this suite drives the remaining surface:
arg parsing -> config merge -> builder -> sharded loaders -> trainer ->
extensions -> orbax.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml
from PIL import Image

pytestmark = pytest.mark.slow  # excluded from the quick lane (-m 'not slow')

WORKER = Path(__file__).parent / "mp_cli_worker.py"
NPROCS = 2
LOCAL_DEVICES = 4


def _free_port() -> int:
    s = socket.socket()
    s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env() -> dict:
    env = {
        k: v for k, v in os.environ.items()
        if k not in (
            "XLA_FLAGS", "JAX_PLATFORMS", "JAX_COORDINATOR_ADDRESS",
            "JAX_NUM_PROCESSES", "JAX_PROCESS_ID", "JAX_LOCAL_DEVICE_IDS",
        )
    }
    repo_root = str(Path(__file__).parent.parent)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (repo_root, env.get("PYTHONPATH")) if p
    )
    return env


def _spawn(workdir, cli, log_dir, nprocs=NPROCS, resume=None):
    port = _free_port()
    procs = []
    for rank in range(nprocs):
        cmd = [
            sys.executable, str(WORKER),
            "--rank", str(rank), "--nprocs", str(nprocs),
            "--port", str(port), "--workdir", str(workdir),
            "--cli", cli, "--log-dir", str(log_dir),
            "--local-devices", str(LOCAL_DEVICES),
        ]
        if resume:
            cmd += ["--resume", resume]
        procs.append(subprocess.Popen(
            cmd, env=_worker_env(),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    outs = [p.communicate(timeout=2400)[0].decode() for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
    return outs


def _seg_fixture(workdir: Path, max_iter: int = 8):
    colors = {"background": "#000000", "printed_text": "#0000FF",
              "handwritten_text": "#FF0000"}
    (workdir / "colors.json").write_text(json.dumps(colors))
    rng = np.random.default_rng(0)
    files = []
    for i in range(16):
        img = rng.integers(0, 255, (32, 32, 3), np.uint8)
        mask = np.zeros((32, 32, 3), np.uint8)
        mask[8:24, 8:24] = (0, 0, 255)
        Image.fromarray(np.concatenate([img, mask], axis=1)).save(
            workdir / f"im_{i}.png"
        )
        files.append({"file_name": f"im_{i}.png"})
    (workdir / "train.json").write_text(json.dumps(files))
    config = {
        "network": "DocUFCN", "dataset": "wpi", "num_classes": 3,
        "image_size": 32, "batch_size": 4, "num_augmentations": 1,
        "num_workers": 1, "lr": 1e-3, "beta1": 0.9, "beta2": 0.999,
        "weight_decay": 0.0, "end_lr": 1e-5, "max_iter": max_iter,
        "snapshot_save_iter": 100, "image_save_iter": 100, "log_iter": 1,
        "display_size": 2, "class_weights": [1.0, 1.0, 1.0], "epochs": 1,
    }
    (workdir / "seg_config.yaml").write_text(yaml.dump(config))


def _gan_fixture(workdir: Path, max_iter: int = 6):
    rng = np.random.default_rng(0)
    files = []
    for i in range(16):
        Image.fromarray(
            rng.integers(0, 255, (32, 32, 3), np.uint8)
        ).save(workdir / f"g_{i}.png")
        files.append(f"g_{i}.png")
    (workdir / "gan_train.json").write_text(json.dumps(files))
    config = {
        "image_size": 32, "latent_size": 32, "n_mlp": 2,
        "channel_multiplier": 1, "stylegan_variant": 2, "batch_size": 4,
        "lr": 2e-3, "max_iter": max_iter, "snapshot_save_iter": 100,
        "image_save_iter": 3, "log_iter": 1, "num_workers": 1,
        "style_mixing_prob": 0.9,
        "regularization": {"g_interval": 4, "d_interval": 4,
                           "r1_weight": 10, "path_reg_weight": 2},
    }
    (workdir / "gan_config.yaml").write_text(yaml.dump(config))


def _losses(log_dir: Path, key: str):
    lines = (log_dir / "log.jsonl").read_text().splitlines()
    return [json.loads(x)[key] for x in lines if key in json.loads(x)]


def test_seg_cli_main_two_processes(tmp_path):
    from synthesis_in_style_tpu.utils.checkpoint import (
        latest_snapshot,
        load_pytree,
        snapshot_iteration,
    )

    _seg_fixture(tmp_path)
    mp_log = tmp_path / "logs" / "mp" / "run" / "t0"
    _spawn(tmp_path, "seg", mp_log)

    snap = latest_snapshot(mp_log / "checkpoints")
    assert snap is not None and snapshot_iteration(snap) == 8
    losses = _losses(mp_log, "loss/softmax")
    assert len(losses) == 8
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]  # it actually trains on the global mesh

    # single-process yardstick: same config, all 8 virtual devices in one
    # process; same scale + converging (exact parity is pinned at the
    # updater level by tests/test_multiprocess.py — batch COMPOSITION
    # differs across process counts by DistributedSampler semantics)
    sp_log = tmp_path / "logs" / "sp" / "run" / "t0"
    _spawn(tmp_path, "seg", sp_log, nprocs=1)
    sp_losses = _losses(sp_log, "loss/softmax")
    assert all(np.isfinite(sp_losses))
    assert sp_losses[-1] < sp_losses[0]
    assert abs(np.log10(losses[0] / sp_losses[0])) < 1.0

    # cross-process-count resume: 1-proc run resumes the 2-proc snapshot at
    # max_iter == snapshot iteration -> 0 further updates -> its finalize
    # snapshot must be LEAF-IDENTICAL to the 2-proc one (orbax sharded save
    # round-trips across process counts)
    import jax

    resumed_log = tmp_path / "logs" / "mp" / "run" / "t1"
    _spawn(tmp_path, "seg", resumed_log, nprocs=1, resume="latest")
    resumed_snap = latest_snapshot(resumed_log / "checkpoints")
    assert snapshot_iteration(resumed_snap) == 8
    a, b = load_pytree(snap), load_pytree(resumed_snap)
    for la, lb in zip(jax.tree_util.tree_leaves(a["segmentation_network"]),
                      jax.tree_util.tree_leaves(b["segmentation_network"])):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    for la, lb in zip(jax.tree_util.tree_leaves(a["main_optimizer"]),
                      jax.tree_util.tree_leaves(b["main_optimizer"])):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_gan_cli_main_two_processes(tmp_path):
    from synthesis_in_style_tpu.utils.checkpoint import (
        latest_snapshot,
        snapshot_iteration,
    )

    _gan_fixture(tmp_path)
    mp_log = tmp_path / "logs" / "mp" / "run" / "t0"
    _spawn(tmp_path, "gan", mp_log)

    snap = latest_snapshot(mp_log / "checkpoints")
    assert snap is not None and snapshot_iteration(snap) == 6
    for key in ("train/discriminator_loss", "train/generator_loss"):
        vals = _losses(mp_log, key)
        assert len(vals) == 6 and all(np.isfinite(vals)), key
    # the lazy regularizers ran on the global mesh (incl. the all-reduced
    # path-length mean, reference stylegan_2_updater.py:193-195)
    assert all(np.isfinite(_losses(mp_log, "train/r1_penalty")))
    assert all(np.isfinite(_losses(mp_log, "train/path_loss")))
    assert list((mp_log / "images").glob("*.png"))


def _spawn_with_kill(workdir, cli, log_dir, kill_at, nprocs=NPROCS):
    """Both ranks preempted at the same iteration; expect exit code 7."""
    port = _free_port()
    procs = []
    for rank in range(nprocs):
        cmd = [
            sys.executable, str(WORKER),
            "--rank", str(rank), "--nprocs", str(nprocs),
            "--port", str(port), "--workdir", str(workdir),
            "--cli", cli, "--log-dir", str(log_dir),
            "--local-devices", str(LOCAL_DEVICES),
            "--kill-at-iter", str(kill_at),
        ]
        procs.append(subprocess.Popen(
            cmd, env=_worker_env(),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    outs = [p.communicate(timeout=2400)[0].decode() for p in procs]
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 7, (
            f"rank {rank} expected preemption exit 7, got {p.returncode}:"
            f"\n{out[-4000:]}"
        )
    return outs


def test_gan_pod_preemption_resume_two_processes(tmp_path):
    """Pod preemption (VERDICT r4 #6): BOTH production-CLI processes die
    mid-run; a fresh 2-process launch with `--resume-ckpt latest` must
    finish with the SAME final snapshot as a straight-through 2-process
    run — the composition of test_resume.py (single-process kill/resume)
    with the 2-process production mains."""
    import jax

    from synthesis_in_style_tpu.utils.checkpoint import (
        latest_snapshot,
        load_pytree,
        snapshot_iteration,
    )

    _gan_fixture(tmp_path, max_iter=6)

    # straight-through 2-process yardstick
    straight_log = tmp_path / "logs" / "straight" / "run" / "t0"
    _spawn(tmp_path, "gan", straight_log)
    straight_snap = latest_snapshot(straight_log / "checkpoints")
    assert snapshot_iteration(straight_snap) == 6

    # preempted attempt: both ranks killed at iteration 3; the trainer
    # finally-block still writes the shared orbax snapshot at 3
    killed_log = tmp_path / "logs" / "preempt" / "run" / "t0"
    _spawn_with_kill(tmp_path, "gan", killed_log, kill_at=3)
    killed_snap = latest_snapshot(killed_log / "checkpoints")
    assert killed_snap is not None and snapshot_iteration(killed_snap) == 3

    # fresh 2-process launch discovers the preemption snapshot and
    # continues to max_iter
    resumed_log = tmp_path / "logs" / "preempt" / "run" / "t1"
    outs = _spawn(tmp_path, "gan", resumed_log, resume="latest")
    assert any("resuming" in o for o in outs)
    resumed_snap = latest_snapshot(resumed_log / "checkpoints")
    assert snapshot_iteration(resumed_snap) == 6

    a, b = load_pytree(straight_snap), load_pytree(resumed_snap)
    for key in ("generator", "discriminator", "g_ema",
                "generator_optimizer", "discriminator_optimizer"):
        for la, lb in zip(jax.tree_util.tree_leaves(a[key]),
                          jax.tree_util.tree_leaves(b[key])):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
