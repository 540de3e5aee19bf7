"""Worker process for tests/test_multiprocess_cli.py: runs a PRODUCTION
train CLI main() end-to-end under real `jax.distributed` (env-driven
bring-up, 4 virtual CPU devices per process, Gloo coordinator on
localhost) — the regime the reference reaches via
`torch.multiprocessing.spawn(main, nprocs)` (reference train.py:185-187,
train_stylegan_2.py:208-212) and never tests.

Unlike tests/mp_worker.py (which exercises the parallel substrate and
updaters directly), this drives the FULL CLI integration surface: arg
parsing -> config merge -> builder -> sharded loaders -> trainer ->
extensions -> orbax snapshots into ONE shared log dir.
"""

import argparse
import os
import sys
from pathlib import Path


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--rank", type=int, required=True)
    parser.add_argument("--nprocs", type=int, required=True)
    parser.add_argument("--port", type=int, required=True)
    parser.add_argument("--workdir", required=True)
    parser.add_argument("--cli", choices=["seg", "gan"], required=True)
    parser.add_argument("--log-dir", required=True)
    parser.add_argument("--local-devices", type=int, default=4)
    parser.add_argument("--resume", default=None)
    parser.add_argument("--kill-at-iter", type=int, default=None,
                        help="simulate pod preemption: raise "
                        "KeyboardInterrupt in THIS process once the "
                        "updater reaches this iteration (the trainer's "
                        "finally block still finalizes the snapshot); "
                        "exits with code 7")
    args = parser.parse_args()

    # Environment BEFORE jax import (tests/mp_worker.py pattern)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.local_devices}"
    ).strip()
    if args.nprocs > 1:
        os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{args.port}"
        os.environ["JAX_NUM_PROCESSES"] = str(args.nprocs)
        os.environ["JAX_PROCESS_ID"] = str(args.rank)

    import jax

    jax.config.update("jax_platforms", "cpu")

    workdir = Path(args.workdir)

    if args.cli == "seg":
        from synthesis_in_style_tpu.cli import train as cli

        argv = [
            str(workdir / "seg_config.yaml"),
            "--images", str(workdir / "train.json"),
            "--class-to-color-map", str(workdir / "colors.json"),
            "--debug",
        ]
    else:
        from synthesis_in_style_tpu.cli import train_stylegan_2 as cli

        argv = [
            str(workdir / "gan_config.yaml"),
            "--images", str(workdir / "gan_train.json"),
            "--debug",
        ]
    if args.resume:
        argv += ["--resume-ckpt", args.resume]

    cli_args = cli.build_parser().parse_args(argv)
    cli_args.log_dir = args.log_dir
    if args.kill_at_iter is not None:
        from synthesis_in_style_tpu.core.updater import Updater

        original = Updater.update
        kill_at = args.kill_at_iter

        def update(self):
            if self.iteration >= kill_at:
                raise KeyboardInterrupt("preempted")
            original(self)

        Updater.update = update
        try:
            cli.main(cli_args)
        except KeyboardInterrupt:
            print(f"rank {args.rank} preempted at iteration {kill_at}",
                  flush=True)
            sys.exit(7)
        raise AssertionError("kill-at-iter never fired")
    cli.main(cli_args)

    # the CLI main() called maybe_initialize_distributed(); prove the run
    # really was multi-process on the global mesh
    assert jax.process_count() == args.nprocs, jax.process_count()
    assert jax.device_count() == args.nprocs * args.local_devices
    print(f"rank {args.rank} CLI {args.cli} OK", flush=True)


if __name__ == "__main__":
    sys.exit(main())
