"""Create a DatasetGAN training dataset: generated images + stored latents /
activation tensors for hand-labelling and pixel-classifier training.

Capability parity with the reference CLI
(/root/reference/stylegan_code_finder/create_dataset_for_activation_classification.py):
same flags, same artifact layout (generated_image_<id>.png, optional empty
label images, full_data/train/test JSONs with 80/20 split, tensors.npz with
`latent_codes` and per-image `activations` dicts).

Usage:
  python -m synthesis_in_style_tpu.cli.create_dataset_for_activation_classification \
      <checkpoint> <image_save_dir> -n 30 --save-latents --save-activations -ge
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np
from PIL import Image

from synthesis_in_style_tpu.core.config import global_config, load_config_from_checkpoint
from synthesis_in_style_tpu.models.factory import load_generator
from synthesis_in_style_tpu.utils.dataset_creation import (
    build_latent_and_noise_generator,
    compute_mean_latent,
    make_generate_fn,
    make_image,
)


def main(args: argparse.Namespace) -> None:
    config = load_config_from_checkpoint(args.checkpoint, args.original_config_path)
    config["batch_size"] = args.batch_size
    image_save_base_dir = Path(args.image_save_dir)
    image_save_base_dir.mkdir(parents=True, exist_ok=True)

    gen, variables = load_generator(args.checkpoint, config)
    mean_latent = compute_mean_latent(gen, variables) if args.truncate else None
    generate = make_generate_fn(gen, variables, truncation_latent=mean_latent)
    latent_stream = build_latent_and_noise_generator(config, seed=args.seed)

    data = []
    latent_codes = []
    save_activations = []
    generated = 0
    while generated < args.num_images:
        z = next(latent_stream)
        activations, images = generate(z)
        images = make_image(images)
        activations = {k: np.asarray(v) for k, v in activations.items()}
        for idx in range(len(images)):
            image_id = generated
            image_name = f"generated_image_{image_id:03d}.png"
            Image.fromarray(images[idx]).save(image_save_base_dir / image_name)

            label_name = f"generated_image_label_{image_id:03d}.png"
            if args.generate_empty_label_images:
                Image.fromarray(np.zeros_like(images[idx])).save(
                    image_save_base_dir / label_name
                )

            item = {"image": image_name, "label": label_name}
            if args.save_activations:
                save_activations.append(
                    {str(k): v[idx] for k, v in activations.items()}
                )
                item["activations"] = len(save_activations) - 1
            if args.save_latents:
                latent_codes.append(np.asarray(z[idx]))
                item["latent"] = len(latent_codes) - 1
            data.append(item)
            generated += 1
            if generated >= args.num_images:
                break
        print(f"\r{generated}/{args.num_images}", end="", flush=True)
    print()

    with (image_save_base_dir / "full_data.json").open("w") as f:
        json.dump(data, f)
    split_index = int(len(data) * 0.8)
    with (image_save_base_dir / "train.json").open("w") as f:
        json.dump(data[:split_index], f)
    with (image_save_base_dir / "test.json").open("w") as f:
        json.dump(data[split_index:], f)

    np.savez_compressed(
        image_save_base_dir / "tensors",
        latent_codes=np.asarray(latent_codes),
        activations=np.asarray(save_activations, dtype=object),
    )


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Creates a dataset based on StyleGAN, which can be used "
        "to train a DatasetGAN-like classifier"
    )
    parser.add_argument("checkpoint")
    parser.add_argument("image_save_dir", type=Path)
    parser.add_argument("-op", "--original-config-path", type=Path, default=None)
    parser.add_argument("-n", "--num-images", type=int, default=100)
    parser.add_argument("-s", "--save-to", default=None)
    parser.add_argument("-b", "--batch-size", default=10, type=int)
    parser.add_argument("--debug", action="store_true", default=False)
    parser.add_argument("--truncate", action="store_true", default=False)
    parser.add_argument("--save-latents", action="store_true", default=False)
    parser.add_argument("--save-activations", action="store_true", default=False)
    parser.add_argument("-ge", "--generate-empty-label-images",
                        action="store_true", default=False)
    parser.add_argument("--seed", type=int, default=1)
    # reference create_dataset_for_activation_classification.py:126-127
    # device flag, accepted as a no-op (cli/compat.py)
    from synthesis_in_style_tpu.cli.compat import add_torch_compat_args

    add_torch_compat_args(parser, short_device=True, distributed=False)
    return parser


if __name__ == "__main__":
    from synthesis_in_style_tpu.cli.compat import warn_ignored_torch_args

    parsed = build_parser().parse_args()
    warn_ignored_torch_args(parsed)
    if not (parsed.save_activations or parsed.save_latents):
        print(
            "Neither --save-latents nor save-activations have been used. Thus, "
            "the resulting npz file will likely be empty."
        )
    global_config.debug = parsed.debug
    main(parsed)
