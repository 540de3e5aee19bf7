"""Cluster discovery: fit per-layer k-means over generator activations and
render cluster visualizations for human labelling.

Capability parity with the reference CLI
(/root/reference/stylegan_code_finder/create_semantic_segmentation.py):
same flags, same artifact layout (`catalogs/<k>.npz` [neutral format replacing
the reference's sklearn pickles], `cluster_arrays/<k>.npz`,
`cluster_images/<k>.png` grid) consumed by the semantic labeller and the
cluster-based dataset segmenters.

TPU-first: activation batches are generated on the TPU and the minibatch
spherical k-means fit runs on device (one matmul per assignment step) —
the reference fit the sklearn estimator on CPU over (N*H*W, C) float arrays
(create_semantic_segmentation.py:181-187, spherical_kmeans.py:161-312).

Usage:
  python -m synthesis_in_style_tpu.cli.create_semantic_segmentation \
      <checkpoint> -n 100 -b 10 -c 3 24
"""

from __future__ import annotations

import argparse
from collections import defaultdict
from itertools import cycle
from pathlib import Path
from typing import Callable, Dict, Iterable, Tuple

import numpy as np
from PIL import Image, ImageColor

from synthesis_in_style_tpu.core.config import load_config_from_checkpoint
from synthesis_in_style_tpu.models.factory import (
    load_autoencoder_or_generator,
    load_generator,
)
from synthesis_in_style_tpu.segmentation.factor_catalog import (
    FactorCatalog,
    save_catalogs,
)
from synthesis_in_style_tpu.utils.dataset_creation import (
    build_latent_and_noise_generator,
    make_generate_fn,
    make_image,
)

# Kelly-inspired distinct color list (reference COLOR_MAP,
# create_semantic_segmentation.py:24-47)
COLOR_MAP = [
    "#00B3FF", "#753E80", "#0068FF", "#D7BDA6", "#2000C1", "#62A2CE",
    "#667081", "#347D00", "#8E76F6", "#8A5300", "#5C7AFF", "#7A3753",
    "#008EFF", "#5128B3", "#00C8F4", "#0D187F", "#00AA93", "#153359",
    "#133AF1", "#162C23",
]


def get_next_color() -> Iterable[Tuple[int, int, int]]:
    return cycle(ImageColor.getrgb(c) for c in COLOR_MAP)


def prepare_output_dir(args: argparse.Namespace) -> Path:
    root_dir = Path(args.checkpoint).parent.parent
    output_dir = root_dir / args.destination
    output_dir.mkdir(exist_ok=True, parents=True)
    return output_dir


def make_encode_generate_fn(ae, variables):
    """Jitted real-image batch -> (activations dict, uint8 images): encode
    through the autoencoder's encoder, decode with activation capture
    (reference get_activations :67-93, the `--images` branch — real images
    embedded via `autoencoder.encode`, then the decoder forward with
    `return_intermediate_activations=True`).

    When the encoder predicts no per-layer noise, the decoder uses its
    stored noise buffers (deterministic) rather than the reference's fresh
    randn draw. The captured activations are post-StyledConv outputs
    (models/stylegan2.py), which DO include noise injection, so this
    deviation perturbs them slightly — the trade is reproducible
    clustering across runs for a small, noise-level activation shift."""
    import jax
    import jax.numpy as jnp

    from synthesis_in_style_tpu.models.autoencoder import is_wplus

    def _encode_capture(mdl, x):
        latents = mdl.encode(x)
        noise = list(latents.noise) if latents.noise is not None else None
        image, acts = mdl.decoder(
            [latents.latent],
            input_is_latent=is_wplus(latents),
            noise=noise,
            randomize_noise=False,
            return_intermediate_activations=True,
        )
        return image, acts

    @jax.jit
    def generate(batch):
        image, acts = ae.apply(variables, batch, method=_encode_capture)
        image = jnp.clip(
            jnp.round((image.astype(jnp.float32) + 1.0) * 127.5), 0, 255
        ).astype(jnp.uint8)
        return acts, image

    return generate


def build_image_batch_stream(json_path, config):
    """Infinite stream of normalized (B, H, W, C) batches from a JSON image
    list (reference build_data_loader with shuffle_off=True,
    create_semantic_segmentation.py:171-172), wrapping at the end."""
    import jax.numpy as jnp

    from synthesis_in_style_tpu.cli.train_stylegan_2 import GANImageDataset

    json_path = Path(json_path)
    dataset = GANImageDataset(
        json_path,
        root=json_path.parent,
        image_size=config["image_size"],
        num_channels=config.get("input_dim", 3),
    )
    batch_size = config["batch_size"]

    def stream():
        index = 0
        while True:
            batch = [
                dataset[i % len(dataset)]["images"]
                for i in range(index, index + batch_size)
            ]
            index += batch_size
            yield jnp.asarray(np.stack(batch))

    return stream()


def get_activations(
    args: argparse.Namespace, generate: Callable, latent_stream
) -> Tuple[Dict[int, np.ndarray], np.ndarray]:
    """N batched forward passes, activations accumulated to host
    (reference get_activations :67-93). NHWC."""
    all_activations = defaultdict(list)
    images = []
    for _ in range(0, args.num_samples, args.batch_size):
        z = next(latent_stream)
        activations, generated = generate(z)
        for key, act in activations.items():
            all_activations[key].append(np.asarray(act))
        images.append(make_image(generated))
    merged = {k: np.concatenate(v, axis=0) for k, v in all_activations.items()}
    return merged, np.concatenate(images, axis=0)


def strip_activations(
    activations: Dict[int, np.ndarray], min_size: int
) -> Dict[int, np.ndarray]:
    """Drop layers at or below min_size resolution (reference :96-97).
    NHWC: spatial dims are axes 1, 2."""
    return {
        k: v
        for k, v in activations.items()
        if v.shape[1] > min_size and v.shape[2] > min_size
    }


def cluster_ids_to_color_image(labels: np.ndarray, num_clusters: int,
                               colors) -> np.ndarray:
    """(B, H, W) int labels -> (B, H, W, 3) uint8 color render (reference
    cluster_id_to_image :100-112 worked on one-hot NCHW)."""
    lut = np.zeros((num_clusters, 3), np.uint8)
    for cluster_id, color in zip(range(num_clusters), colors):
        lut[cluster_id] = color
    return lut[labels]


def find_and_render_clusters(
    all_activations: Dict[int, np.ndarray], num_clusters: int
) -> Tuple[Dict[int, np.ndarray], Dict[str, FactorCatalog], Dict[str, np.ndarray]]:
    """Fit one FactorCatalog per layer on device; render color maps
    (reference find_and_render_clusters :115-130). Also returns the integer
    per-pixel labels per layer (consumed by the semantic labeller)."""
    rendered = {}
    catalogs: Dict[str, FactorCatalog] = {}
    label_arrays: Dict[str, np.ndarray] = {}
    for size_key, activations in all_activations.items():
        catalog = FactorCatalog(num_clusters)
        labels = np.asarray(catalog.fit_predict(activations))
        rendered[size_key] = cluster_ids_to_color_image(
            labels, num_clusters, get_next_color()
        )
        catalogs[str(size_key)] = catalog
        label_arrays[str(size_key)] = labels.astype(np.int32)
    return rendered, catalogs, label_arrays


def save_cluster_visualizations(
    cluster_images: Dict[int, np.ndarray],
    generated_images: np.ndarray,
    num_clusters: int,
    dest_dir: Path,
) -> None:
    """cluster_arrays/<k>.npz + a cluster_images/<k>.png grid (rows = layers,
    cols = samples; reference save_cluster_visualizations :140-161)."""
    array_path = (dest_dir / "cluster_arrays" / f"{num_clusters}.npz").resolve()
    array_path.parent.mkdir(parents=True, exist_ok=True)
    # store NCHW uint8 like the reference so the labeller artifacts match
    np.savez_compressed(
        str(array_path),
        **{str(k): v.transpose(0, 3, 1, 2) for k, v in cluster_images.items()},
    )

    all_images = dict(cluster_images)
    all_images[max(cluster_images.keys()) + 1] = generated_images
    largest = max(img.shape[1] for img in all_images.values())
    rows = []
    for key in all_images:
        batch = all_images[key]
        if batch.shape[1] != largest:
            batch = np.stack(
                [
                    np.asarray(
                        Image.fromarray(img).resize((largest, largest), Image.NEAREST)
                    )
                    for img in batch
                ]
            )
        rows.append(np.concatenate(list(batch), axis=1))
    grid = np.concatenate(rows, axis=0)

    image_path = (dest_dir / "cluster_images" / f"{num_clusters}.png").resolve()
    image_path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(grid).save(image_path)


def main(args: argparse.Namespace) -> None:
    output_dir = prepare_output_dir(args)
    config = load_config_from_checkpoint(args.checkpoint, args.original_config_path)
    config["batch_size"] = args.batch_size

    if getattr(args, "images", None) is not None:
        # real base images through the autoencoder's encoder (reference
        # `-i/--images`, create_semantic_segmentation.py:170-172 — "only
        # works with autoencoder checkpoint")
        model, variables = load_autoencoder_or_generator(
            args.checkpoint, config
        )
        if not hasattr(model, "encoder"):
            raise ValueError(
                "--images requires an autoencoder checkpoint (one with an "
                "'autoencoder' entry); this checkpoint only holds a "
                "generator — drop --images to cluster sampled latents"
            )
        generate = make_encode_generate_fn(model, variables)
        latent_stream = build_image_batch_stream(args.images, config)
    else:
        gen, variables = load_generator(args.checkpoint, config)
        generate = make_generate_fn(gen, variables)
        latent_stream = build_latent_and_noise_generator(config)

    activations, generated_images = get_activations(args, generate, latent_stream)
    if args.strip_activations_from is not None:
        activations = strip_activations(activations, args.strip_activations_from)

    for num_clusters in range(*args.cluster_range):
        print(f"clustering k={num_clusters}")
        rendered, catalogs, label_arrays = find_and_render_clusters(
            activations, num_clusters
        )
        save_catalogs(
            catalogs, output_dir.resolve() / "catalogs" / f"{num_clusters}.npz"
        )
        labels_path = output_dir.resolve() / "cluster_labels" / f"{num_clusters}.npz"
        labels_path.parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(str(labels_path), **label_arrays)
        save_cluster_visualizations(
            rendered, generated_images, num_clusters, output_dir
        )


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Use a trained generator to produce images and cluster "
        "catalogs of its intermediate activations for human labelling."
    )
    parser.add_argument("checkpoint", help="Path to trained generator checkpoint")
    parser.add_argument("-op", "--original-config-path", type=Path, default=None)
    parser.add_argument("--destination", default="semantic_segmentation")
    parser.add_argument("-b", "--batch-size", default=10, type=int)
    parser.add_argument("-n", "--num-samples", default=100, type=int)
    parser.add_argument("-c", "--cluster-range", nargs=2, default=[3, 24], type=int)
    parser.add_argument(
        "-i", "--images", default=None,
        help="path to a JSON image list to embed as base images instead of "
        "sampling latents (only works with an autoencoder checkpoint; "
        "reference create_semantic_segmentation.py:209-210)",
    )
    parser.add_argument("-s", "--strip-activations-from", type=int, default=None)
    # reference create_semantic_segmentation.py:199 device flag, accepted
    # as a no-op (cli/compat.py)
    from synthesis_in_style_tpu.cli.compat import add_torch_compat_args

    add_torch_compat_args(parser, distributed=False)
    return parser


if __name__ == "__main__":
    from synthesis_in_style_tpu.cli.compat import warn_ignored_torch_args

    parsed = build_parser().parse_args()
    warn_ignored_torch_args(parsed)
    main(parsed)
