"""Train a semantic-segmentation network on a (synthetic) labelled dataset.

Capability parity with the reference CLI
(/root/reference/stylegan_code_finder/train.py): same flags, same YAML
config + argparse merge, same log-dir convention
`logs/<log_dir>/<log_name>/<ISO-timestamp>`, same extension set
(logger/evaluator/snapshotter/image plotter/LR schedule).

TPU-first: no torch.multiprocessing.spawn / DDP / NCCL — a single-controller
process jits the train step; on multi-chip hardware the batch is sharded
over a ('data',) mesh and XLA inserts the gradient collectives
(parallel.mesh; SURVEY.md §2.6).

Usage:
  python -m synthesis_in_style_tpu.cli.train <config.yaml> \
      --images train.json --class-to-color-map colors.json -l out -ln run1
"""

from __future__ import annotations

import argparse
import datetime
import json
import logging
import os
from pathlib import Path

from synthesis_in_style_tpu.core.config import (
    global_config,
    load_yaml_config,
    merge_config_and_args,
    save_run_config,
)
from synthesis_in_style_tpu.core.extensions import LogWriter, LRReporter
from synthesis_in_style_tpu.core.trainer import Trainer
from synthesis_in_style_tpu.data import AugmentedSegmentationDataset, DataLoader
from synthesis_in_style_tpu.training_builder import get_train_builder_class


def sanity_check_config(config: dict) -> None:
    """Reference sanity_check_config (train.py:26-36)."""
    if "network" in config:
        choices = ["DocUFCN", "TransUNet", "EMANet", "PixelEnsemble"]
        assert config["network"] in choices, (
            f'The network must be one of: {", ".join(choices)}'
        )
    if "dataset" in config:
        choices = ["wpi", "dataset_gan"]
        assert config["dataset"] in choices, (
            f'The dataset must be one of: {", ".join(choices)}'
        )
    with open(config["class_to_color_map"]) as f:
        class_to_color_map = json.load(f)
    assert len(class_to_color_map) == config["num_classes"], (
        "The number of classes in the class_to_color_map must be equal to "
        "the num_classes in the config"
    )


def get_data_loader(
    json_path: Path, config: dict, args: argparse.Namespace, validation: bool = False
):
    """Dataset dispatch (reference utils/data_loading.py:123-156)."""
    dataset_name = config.get("dataset", "wpi")
    if dataset_name == "wpi":
        dataset = AugmentedSegmentationDataset(
            json_path,
            class_to_color_map_path=Path(args.class_to_color_map),
            root=json_path.parent,
            image_size=config["image_size"],
            num_augmentations=config.get("num_augmentations", 1),
        )
    elif dataset_name == "dataset_gan":
        from synthesis_in_style_tpu.data.dataset_gan_dataset import (
            build_dataset_gan_dataset,
        )

        dataset = build_dataset_gan_dataset(json_path, config, args)
    else:
        raise NotImplementedError
    num_workers = 1 if global_config.debug else config.get("num_workers", 8)
    # validation runs UNSHARDED (num_shards=1): the evaluator applies the
    # global-mesh model state to each host's local batch, and jax requires
    # host-local inputs to a multi-process computation to be identical on
    # every host (device_put asserts it) — process-sharded val batches
    # would differ per host and crash; replicating the val pass gives
    # every host the same (global) metrics instead, write-gated to rank 0
    shard_kwargs = (
        dict(shard_id=0, num_shards=1) if validation else {}
    )
    return DataLoader(
        dataset,
        config["batch_size"],
        shuffle=not validation,
        drop_last=not validation,
        num_workers=num_workers,
        **shard_kwargs,
    )


def main(args: argparse.Namespace) -> None:
    from synthesis_in_style_tpu.parallel import maybe_initialize_distributed

    maybe_initialize_distributed()
    global_config.debug = args.debug

    config = load_yaml_config(args.config)
    config = merge_config_and_args(config, args)
    config["log_dir"] = args.log_dir
    sanity_check_config(config)

    resume_iteration = 0
    if config.get("resume_ckpt") == "latest":
        # preemption auto-resume across timestamped attempts of this
        # logs/<log_dir>/<log_name> run (see cli/train_stylegan_2.py)
        from synthesis_in_style_tpu.utils.checkpoint import (
            discover_latest_snapshot,
            snapshot_iteration,
        )

        found = discover_latest_snapshot(Path(args.log_dir).parent)
        if found is None:
            print("--resume-ckpt latest: no snapshot found, starting fresh")
            config["resume_ckpt"] = None
        else:
            resume_iteration = snapshot_iteration(found)
            print(f"--resume-ckpt latest: resuming {found} "
                  f"at iteration {resume_iteration}")
            config["resume_ckpt"] = str(found)
    elif config.get("resume_ckpt"):
        # explicit snapshot path: full resume too (this flag is additive —
        # weights-only loading is what --fine-tune is for)
        from synthesis_in_style_tpu.utils.checkpoint import snapshot_iteration

        resume_iteration = snapshot_iteration(config["resume_ckpt"])

    train_data_loader = get_data_loader(Path(config["train_json"]), config, args)
    val_data_loader = (
        get_data_loader(
            Path(config["validation_json"]), config, args, validation=True
        )
        if args.validation_json is not None
        else None
    )

    train_builder_class = get_train_builder_class(config)
    builder = train_builder_class(config, train_data_loader, val_data_loader)

    if "max_iter" in config:
        stop_trigger = (config["max_iter"], "iteration")
    else:
        stop_trigger = (config["epochs"], "epoch")

    trainer = Trainer(builder.get_updater(), stop_trigger, log_dir=args.log_dir)
    if resume_iteration:
        trainer.updater.iteration = resume_iteration
        train_data_loader.seek(resume_iteration)
    save_run_config(args.log_dir, config, args)

    evaluator = builder.get_evaluator()
    if evaluator is not None:
        trainer.extend(evaluator)
    trainer.extend(builder.get_snapshotter())
    image_plotter = builder.get_image_plotter()
    if image_plotter is not None:
        trainer.extend(image_plotter)
    trainer.extend(
        LRReporter({"main": builder.lr_schedule()}, trigger=(config.get("log_iter", 10), "iteration"))
    )
    trainer.extend(
        LogWriter(
            args.log_dir,
            trigger=(config.get("log_iter", 10), "iteration"),
            use_wandb=not global_config.debug and args.wandb_project_name is not None,
            wandb_kwargs={
                "project": args.wandb_project_name,
                "entity": args.wandb_entity,
                "name": args.log_name,
                "config": config,
            },
        )
    )

    logging.info("Setup complete. Starting training...")
    from synthesis_in_style_tpu.utils.profiling import trace

    with trace(getattr(args, "profile_dir", None)):
        trainer.train()
    logging.info("Training finished")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Train a network for semantic segmentation of documents"
    )
    parser.add_argument("config", help="path to config with common train settings")
    parser.add_argument("-op", "--original-generator-config-path", type=Path,
                        default=None)
    parser.add_argument("--images", dest="train_json", required=True,
                        help="Path to json file with train images")
    parser.add_argument("--val-images", dest="validation_json", default=None,
                        help="path to json file with validation images")
    parser.add_argument("--coco-gt", default=None)
    parser.add_argument("--fine-tune", default=None,
                        help="Path to model to finetune from")
    parser.add_argument("--resume-ckpt", dest="resume_ckpt", default=None,
                        help="snapshot to FULLY resume from (weights + "
                        "optimizer + iteration + data position); 'latest' "
                        "auto-discovers the newest snapshot across this "
                        "run's timestamped attempts (preemption resume)")
    parser.add_argument("--class-to-color-map", default="handwriting_colors.json")
    parser.add_argument("-c", "--cache-root", default=None)
    parser.add_argument("-l", "--log-dir", default="training", help="outputs path")
    parser.add_argument("-ln", "--log-name", default="training")
    parser.add_argument("--warm-restarts", action="store_true", default=False)
    parser.add_argument("--wandb-project-name", default=None)
    parser.add_argument("--wandb-entity", default=None)
    parser.add_argument("--debug", action="store_true", default=False)
    parser.add_argument("--profile-dir", default=None,
                        help="capture a jax.profiler trace of the run")
    # reference train.py:166-168 DDP plumbing flags, accepted as no-ops
    from synthesis_in_style_tpu.cli.compat import add_torch_compat_args

    add_torch_compat_args(parser, device=False)
    return parser


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    parsed = build_parser().parse_args()
    from synthesis_in_style_tpu.cli.compat import warn_ignored_torch_args

    warn_ignored_torch_args(parsed)
    parsed.log_dir = os.path.join(
        "logs", parsed.log_dir, parsed.log_name,
        datetime.datetime.now().isoformat(),
    )
    main(parsed)
