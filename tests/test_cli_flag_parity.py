"""Drop-in CLI flag parity: every reference entry-point invocation parses.

Each argv below is shaped exactly like the reference CLI's parser accepts
(reference train.py:154-179, train_stylegan_2.py:186-202,
train_adversarial_generator.py:177-190, create_semantic_segmentation.py:191-213,
create_dataset_for_segmentation.py:211-237,
create_dataset_for_activation_classification.py:114-135), including the
torch-era plumbing flags (`--device`/`-d`, `--local_rank`, `--mpi-backend`)
that are accepted-and-ignored here (cli/compat.py). A reference user's
launch script must parse unchanged.
"""

from pathlib import Path


def test_train_flags():
    from synthesis_in_style_tpu.cli.train import build_parser

    args = build_parser().parse_args(
        [
            "config.yaml",
            "--images", "train.json",
            "--val-images", "val.json",
            "--coco-gt", "coco.json",
            "--fine-tune", "model.pt",
            "--local_rank", "0",
            "--mpi-backend", "nccl",
            "--class-to-color-map", "colors.json",
            "-c", "cache",
            "-l", "out",
            "-ln", "run",
            "--warm-restarts",
            "--wandb-project-name", "proj",
            "--wandb-entity", "ent",
            "--debug",
        ]
    )
    assert args.train_json == "train.json"
    assert args.mpi_backend == "nccl"


def test_train_stylegan_2_flags():
    from synthesis_in_style_tpu.cli.train_stylegan_2 import build_parser

    args = build_parser().parse_args(
        [
            "config.yaml",
            "--resume-ckpt", "ckpt.pt",
            "--images", "train.json",
            "--val-images", "val.json",
            "--device", "cuda",
            "-l", "out",
            "-ln", "run",
            "--local_rank", "0",
            "--mpi-backend", "gloo",
            "--cache-root", "cache",
            "-s", "SWAGAN",  # reference applies type=str.lower
            "--wandb-project-name", "proj",
            "--wandb-entity", "ent",
        ]
    )
    assert args.stylegan_variant == "swagan"
    assert args.device == "cuda"


def test_train_adversarial_generator_flags():
    """Reference positional order is `config autoencoder_checkpoint`
    (train_adversarial_generator.py:178-179)."""
    from synthesis_in_style_tpu.cli.train_adversarial_generator import (
        build_parser,
    )

    args = build_parser().parse_args(
        [
            "config.yaml",
            "autoencoder.pt",
            "-o", "orig.json",
            "-f", "fake.json",
            "--val-images", "val.json",
            "--absolute",
            "-d", "cuda",
            "-l", "out",
            "-ln", "run",
            "--local_rank", "0",
            "--mpi-backend", "gloo",
            "--overwrite-config",
        ]
    )
    assert args.config == "config.yaml"
    assert args.autoencoder_checkpoint == "autoencoder.pt"
    assert args.original_images == "orig.json"
    assert args.fake_images == "fake.json"


def test_create_semantic_segmentation_flags():
    from synthesis_in_style_tpu.cli.create_semantic_segmentation import (
        build_parser,
    )

    args = build_parser().parse_args(
        [
            "checkpoint",
            "-op", "config.json",
            "--device", "cuda",
            "--destination", "dest",
            "-b", "4",
            "-n", "10",
            "-c", "3", "5",
            "-i", "images.json",
            "-s", "8",
        ]
    )
    assert args.images == "images.json"
    assert args.strip_activations_from == 8


def test_create_dataset_for_segmentation_flags():
    from synthesis_in_style_tpu.cli.create_dataset_for_segmentation import (
        build_parser,
    )

    args = build_parser().parse_args(
        [
            "checkpoint",
            "config.json",
            "-op", "orig.json",
            "-n", "10",
            "-s", "out",
            "-b", "4",
            "-d", "cuda",
            "--only-create-train-val-split",
            "--debug",
            "--truncate",
            "--num-clusters", "6",
            "--classifier-path", "cls.pt",
            "-ssd", "semseg",
        ]
    )
    assert args.device == "cuda"
    assert args.semantic_segmentation_base_dir == Path("semseg")


def test_create_dataset_for_activation_classification_flags():
    from synthesis_in_style_tpu.cli.create_dataset_for_activation_classification import (  # noqa: E501
        build_parser,
    )

    args = build_parser().parse_args(
        [
            "checkpoint",
            "save_dir",
            "-op", "orig.json",
            "-n", "10",
            "-s", "out",
            "-b", "4",
            "-d", "cuda",
            "--debug",
            "--truncate",
            "--save-latents",
            "--save-activations",
            "-ge",
            "--seed", "3",
        ]
    )
    assert args.device == "cuda"
    assert args.seed == 3


def test_compat_args_are_inert_by_default():
    """Defaults must not leak into merge_config_and_args (None filtered)."""
    import argparse

    from synthesis_in_style_tpu.cli.compat import add_torch_compat_args
    from synthesis_in_style_tpu.core.config import merge_config_and_args

    parser = argparse.ArgumentParser()
    add_torch_compat_args(parser, short_device=True)
    args = parser.parse_args([])
    merged = merge_config_and_args({"a": 1}, args)
    assert "device" not in merged
    assert "mpi_backend" not in merged
    assert "local_rank" not in merged


def test_local_rank_zero_does_not_warn():
    """Passing the default rank 0 explicitly must stay silent; a nonzero
    rank triggers the one accepted-and-ignored warning."""
    import argparse
    import warnings

    from synthesis_in_style_tpu.cli.compat import (
        add_torch_compat_args,
        warn_ignored_torch_args,
    )

    parser = argparse.ArgumentParser()
    add_torch_compat_args(parser)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        warn_ignored_torch_args(parser.parse_args(["--local_rank", "0"]))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        warn_ignored_torch_args(parser.parse_args(["--local_rank", "1"]))
    assert any("--local_rank" in str(w.message) for w in caught)
