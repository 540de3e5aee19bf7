"""Accepted-and-ignored torch-era flags for drop-in CLI compatibility.

The reference CLIs expose CUDA/DDP plumbing flags — `--device`/`-d`,
`--local_rank`, `--mpi-backend` (reference train_stylegan_2.py:194-199,
train.py:166-168, train_adversarial_generator.py:184-189,
create_dataset_for_segmentation.py:223-224). On TPU the JAX runtime picks
the backend and `parallel.maybe_initialize_distributed()` handles
multi-host bring-up, so these flags have no effect here — but reference
launch scripts pass them, so every CLI accepts them and warns instead of
erroring, keeping the command surface drop-in compatible.
"""

from __future__ import annotations

import argparse
import warnings


def add_torch_compat_args(
    parser: argparse.ArgumentParser,
    *,
    device: bool = True,
    short_device: bool = False,
    distributed: bool = True,
) -> None:
    """Register the reference's torch/DDP flags as accepted no-ops.

    `short_device` also registers `-d` (the reference uses `-d --device`
    on the dataset-creation and adversarial CLIs, long-only elsewhere).
    Defaults are all `None` so `merge_config_and_args` never copies a
    phantom value into the run config.
    """
    if device:
        flags = ("-d", "--device") if short_device else ("--device",)
        parser.add_argument(
            *flags,
            default=None,
            help="ignored (torch-era flag): JAX selects the TPU/CPU backend",
        )
    if distributed:
        parser.add_argument(
            "--local_rank",
            type=int,
            default=None,
            help="ignored (torch-era flag): multi-host init is automatic "
            "(parallel.maybe_initialize_distributed)",
        )
        parser.add_argument(
            "--mpi-backend",
            default=None,
            choices=["nccl", "gloo"],
            help="ignored (torch-era flag): XLA collectives need no "
            "backend choice",
        )


def warn_ignored_torch_args(args: argparse.Namespace) -> None:
    """One warning naming any torch-era flag the user actually passed."""
    ignored = [
        f"--{name.replace('_', '-')}"
        for name in ("device", "mpi_backend")
        if getattr(args, name, None) is not None
    ]
    if getattr(args, "local_rank", None):  # None (unset) and 0 both silent
        ignored.append("--local_rank")
    if ignored:
        warnings.warn(
            "ignoring torch-era flag(s) " + ", ".join(ignored) + " — JAX "
            "selects devices and collectives automatically on TPU",
            stacklevel=2,
        )
