"""Evaluate a list of generator/autoencoder checkpoints with PSNR/SSIM and
FID over one or more datasets (reference
scripts/evaluate_checkpoints.py:22-163): per-checkpoint per-dataset result
JSONs with skip-if-already-evaluated resume.

Usage:
  python -m synthesis_in_style_tpu.scripts.evaluate_checkpoints \
      checkpoints.txt datasets.json [--skip-fid] [--skip-reconstruction]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from synthesis_in_style_tpu.core.config import load_config_from_checkpoint
from synthesis_in_style_tpu.data import DataLoader
from synthesis_in_style_tpu.evaluation.fid import GenerativeFID
from synthesis_in_style_tpu.evaluation.psnr_ssim import PSNRSSIMEvaluator
from synthesis_in_style_tpu.models.factory import load_generator


def save_eval_result(result: dict, eval_type: str, dest_dir: Path,
                     dataset_name: str, checkpoint_name: str) -> None:
    """(reference save_eval_result :22-35)."""
    dest = dest_dir / dataset_name / f"{checkpoint_name}_{eval_type}.json"
    dest.parent.mkdir(parents=True, exist_ok=True)
    with dest.open("w") as f:
        json.dump(result, f, indent=2)


def has_not_been_evaluated(checkpoint_name: str, dataset_name: str,
                           evaluation_root: Path) -> Dict[str, bool]:
    """(reference :70-88)."""
    return {
        eval_type: not (
            evaluation_root / dataset_name /
            f"{checkpoint_name}_{eval_type}.json"
        ).exists()
        for eval_type in ("reconstruction", "fid")
    }


def evaluate_checkpoint(checkpoint: str, dataset: dict, args) -> None:
    checkpoint_path = Path(checkpoint)
    checkpoint_name = checkpoint_path.stem
    dataset_name = dataset["name"]
    evaluation_root = Path(args.evaluation_root)
    todo = has_not_been_evaluated(checkpoint_name, dataset_name, evaluation_root)
    todo = {
        "reconstruction": args.reconstruction and todo["reconstruction"],
        "fid": args.fid and todo["fid"],
    }
    if not any(todo.values()):
        # skip BEFORE loading anything (reference :104-106 resume semantics)
        return

    config = load_config_from_checkpoint(checkpoint, args.original_config_path)
    config.setdefault("batch_size", args.batch_size)
    gen, variables = load_generator(checkpoint, config)

    from synthesis_in_style_tpu.cli.train_stylegan_2 import GANImageDataset

    val_json = Path(dataset["images"])
    data = GANImageDataset(
        val_json, root=val_json.parent, image_size=config["image_size"],
        num_channels=config.get("input_dim", 3),
    )
    loader = DataLoader(data, args.batch_size, num_workers=2, shuffle=False,
                        drop_last=False)

    if todo["reconstruction"]:
        # PSNR/SSIM of the AUTOENCODER reconstruction against the real
        # validation images (the reference evaluated autoencoder
        # checkpoints, :38-53). Generator-only snapshots have no defined
        # reconstruction — record the skip so the sweep does not retry.
        from synthesis_in_style_tpu.models.factory import (
            load_autoencoder_or_generator,
        )

        model, model_vars = load_autoencoder_or_generator(checkpoint, config)
        if hasattr(model, "encode"):
            evaluator = PSNRSSIMEvaluator()
            psnrs, ssims = [], []
            for i, batch in enumerate(loader):
                images = jnp.asarray(batch["images"])
                recon = model.apply(
                    model_vars, images,
                    rngs={"noise": jax.random.PRNGKey(i)},
                )
                psnr, ssim = evaluator.psnr_and_ssim(recon, images)
                psnrs.append(float(psnr))
                ssims.append(float(ssim))
            result = {
                "psnr": float(np.mean(psnrs)),
                "ssim": float(np.mean(ssims)),
            }
        else:
            result = {"skipped": "generator-only checkpoint has no "
                                 "reconstruction path"}
        save_eval_result(
            result, "reconstruction", evaluation_root, dataset_name,
            checkpoint_name,
        )

    if todo["fid"]:
        fid = GenerativeFID(
            latent_size=gen.style_dim, batch_size=args.batch_size,
            num_samples=args.num_fid_samples, batch_image_key="images",
        )

        @jax.jit
        def sample(z):
            images, _ = gen.apply(variables, [z], randomize_noise=False)
            return images

        score = fid(sample, loader, dataset_path=val_json)
        save_eval_result(
            {"fid": score}, "fid", evaluation_root, dataset_name,
            checkpoint_name,
        )


def main(args: argparse.Namespace) -> None:
    with open(args.checkpoint_list) as f:
        checkpoints = [line.strip() for line in f if line.strip()]
    with open(args.dataset_file) as f:
        datasets = json.load(f)
    failed = []
    for checkpoint in checkpoints:
        for dataset in datasets:
            print(f"evaluating {checkpoint} on {dataset['name']}")
            try:
                evaluate_checkpoint(checkpoint, dataset, args)
            except Exception as e:  # noqa: BLE001 — one bad combination must
                # not abort the sweep (reference :146-157)
                print(f"  FAILED: {e}")
                failed.append((checkpoint, dataset["name"], str(e)))
    if failed:
        print("failed combinations:")
        for checkpoint, name, err in failed:
            print(f"  {checkpoint} on {name}: {err}")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Evaluate trained checkpoints with PSNR/SSIM and FID"
    )
    parser.add_argument("checkpoint_list",
                        help="file with one checkpoint path per line")
    parser.add_argument("dataset_file",
                        help='json: [{"name": ..., "images": val.json}, ...]')
    parser.add_argument("--skip-fid", dest="fid", action="store_false",
                        default=True)
    parser.add_argument("--skip-reconstruction", dest="reconstruction",
                        action="store_false", default=True)
    parser.add_argument("--evaluation-root", default="evaluation_results")
    parser.add_argument("-op", "--original-config-path", type=Path, default=None)
    parser.add_argument("-b", "--batch-size", type=int, default=8)
    parser.add_argument("--num-fid-samples", type=int, default=1000)
    return parser


if __name__ == "__main__":
    main(build_parser().parse_args())
