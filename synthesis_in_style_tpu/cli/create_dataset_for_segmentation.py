"""Synthesize a labelled segmentation dataset from a trained generator.

Capability parity with the reference CLI
(/root/reference/stylegan_code_finder/create_dataset_for_segmentation.py):
same flags, same output layout (sharded [image|mask] PNG pairs, 90/10
train/val split JSONs with per-image `has_<class>` flags, coco_gt.json).

TPU-first: synthesis + activation capture + k-means cluster assignment +
mask resize run as one jitted program per batch on the TPU; only the boolean
class masks cross to the host for the contour/classification stage.

Usage:
  python -m synthesis_in_style_tpu.cli.create_dataset_for_segmentation \
      <checkpoint> <config.json> -n 1000 -b 10 --num-clusters 17
"""

from __future__ import annotations

import argparse
import functools
import json
import random
import traceback
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image

from synthesis_in_style_tpu.core.config import global_config, load_config_from_checkpoint
from synthesis_in_style_tpu.evaluation.coco_gt import (
    COCOGtCreator,
    iter_through_images_in,
)
from synthesis_in_style_tpu.models.factory import load_generator
from synthesis_in_style_tpu.segmentation.dataset_segmenter import (
    BaseDatasetSegmenter,
    BlackWhiteHandwrittenPrintedTextDatasetSegmenter,
)
from synthesis_in_style_tpu.utils.dataset_creation import (
    build_latent_and_noise_generator,
    compute_mean_latent,
    get_base_dirs,
    make_generate_fn,
    make_image,
    save_generated_images,
)


def get_dataset_segmenter(
    args: argparse.Namespace,
    creation_config: dict,
    image_size: int,
    semantic_segmentation_base_dir: Path,
) -> BaseDatasetSegmenter:
    """Reference get_dataset_segmenter (create_dataset_for_segmentation.py:52-81)."""
    if creation_config["segmenter_type"] == "black_white_handwritten_printed":
        assert "only_keep_overlapping" in creation_config, (
            'The key "only_keep_overlapping" must be specified in the config file.'
        )
        segmenter_class = functools.partial(
            BlackWhiteHandwrittenPrintedTextDatasetSegmenter,
            keys_to_merge=creation_config["keys_to_merge"],
            only_keep_overlapping=creation_config["only_keep_overlapping"],
            keys_for_class_determination=creation_config["keys_for_class_determination"],
            keys_for_finegrained_segmentation=creation_config[
                "keys_for_finegrained_segmentation"
            ],
            num_clusters=args.num_clusters,
            min_class_contour_area=creation_config["min_class_contour_area"],
            clip_to_class_regions=creation_config.get(
                "clip_to_class_regions", False
            ),
            fine_mask_dilation=creation_config.get("fine_mask_dilation", 0),
        )
    elif creation_config["segmenter_type"] == "dataset_gan":
        from synthesis_in_style_tpu.segmentation.dataset_gan_segmenter import (
            DatasetGANSegmenter,
        )

        segmenter_class = functools.partial(
            DatasetGANSegmenter,
            classifier_path=args.classifier_path,
        )
    else:
        raise NotImplementedError
    return segmenter_class(
        base_dir=semantic_segmentation_base_dir,
        image_size=image_size,
        class_to_color_map=creation_config["class_to_color_map"],
    )


def build_dataset(
    args: argparse.Namespace,
    creation_config: Dict,
    original_config_path: Optional[Path] = None,
) -> None:
    """Hot loop (reference build_dataset :109-148): synth batch → segment →
    drop bad images → save PNG pairs."""
    config = load_config_from_checkpoint(args.checkpoint, original_config_path)
    config["batch_size"] = args.batch_size
    if creation_config.get("quantize", False) or getattr(args, "quantize", False):
        # int8 serving path (ops/quant.py) — a synthesis-time decision, so
        # it comes from the creation config / CLI, not the train config
        config["quantize"] = True
    image_save_base_dir, semantic_segmentation_base_dir = get_base_dirs(args)

    gen, variables = load_generator(args.checkpoint, config)
    mean_latent = (
        compute_mean_latent(gen, variables) if args.truncate else None
    )
    generate = make_generate_fn(
        gen, variables, truncation_latent=mean_latent,
        gray_fetch=bool(getattr(args, "gray_fetch", False)),
    )

    segmenter = get_dataset_segmenter(
        args, creation_config, config["image_size"], semantic_segmentation_base_dir
    )
    latent_stream = build_latent_and_noise_generator(
        config, seed=creation_config["seed"]
    )

    # Pipelined loop: dispatch batch i+1's device work (synthesis + fused
    # cluster prediction) BEFORE blocking on batch i's transfer, so the host
    # contour/PNG stage overlaps device compute (JAX async dispatch).
    can_pipeline = hasattr(segmenter, "begin_prepare")
    use_device_contours = bool(
        getattr(args, "device_contours", False)
        and hasattr(segmenter, "begin_segment_on_device")
    )
    contour_pool = None
    if (
        can_pipeline
        and not use_device_contours
        and getattr(args, "contour_workers", 0) > 0
    ):
        from synthesis_in_style_tpu.segmentation.contour_pool import (
            ContourWorkerPool,
        )

        contour_pool = ContourWorkerPool(segmenter, args.contour_workers)
    generated = 0
    pending = None  # (images_device, masks_device, batch_size)

    def process(pending_batch):
        nonlocal generated
        images_dev, masks_dev, batch_size = pending_batch
        if use_device_contours:
            label_images, image_ids_to_drop = (
                segmenter.finish_segment_on_device(masks_dev)
            )
        elif can_pipeline:
            predicted = segmenter.finish_prepare(masks_dev)
            contour_half = (
                contour_pool.segment_prepared
                if contour_pool is not None
                else segmenter.segment_prepared
            )
            label_images, image_ids_to_drop = contour_half(
                predicted, batch_size
            )
        else:
            label_images, image_ids_to_drop = segmenter.create_segmentation_image(
                masks_dev
            )
        images = make_image(images_dev)
        if images.ndim == 3:  # --gray-fetch: replicate to RGB host-side
            images = np.repeat(images[..., None], 3, axis=-1)
        images = np.delete(images, image_ids_to_drop, axis=0)
        label_images = np.delete(label_images, image_ids_to_drop, axis=0)
        if len(label_images) > 0:
            save_generated_images(
                images, label_images, generated, image_save_base_dir,
                args.num_images,
            )
        generated += len(label_images)
        print(
            f"\rCreating images: "
            f"{min(generated, args.num_images)}/{args.num_images}",
            end="", flush=True,
        )

    try:
        while generated < args.num_images or pending is not None:
            # count the in-flight batch toward the target so the pipeline
            # does not dispatch (and save) a whole extra batch beyond
            # num_images — overshoot stays < batch_size, like the
            # reference's serial loop; if drops shrink the in-flight batch
            # the while-condition re-checks and dispatches more
            in_flight = pending[2] if pending is not None else 0
            if generated + in_flight < args.num_images:
                z = next(latent_stream)
                activations, images = generate(z)
                batch_size = int(z.shape[0])
                if use_device_contours:
                    masks = segmenter.begin_segment_on_device(activations)
                elif can_pipeline:
                    masks = segmenter.begin_prepare(activations)
                else:
                    masks = activations
                new_pending = (images, masks, batch_size)
            else:
                new_pending = None
            if pending is not None:
                process(pending)
            pending = new_pending
        print()
    finally:
        # always reap the spawned workers — a crash/KeyboardInterrupt in the
        # loop must not leak them
        if contour_pool is not None:
            contour_pool.shutdown()


def create_dataset_json_data(
    image_paths: List[Path], image_root: Path, gt_creator: COCOGtCreator
) -> Tuple[List[dict], bool]:
    """Reference create_dataset_json_data :151-166 (partial-result `.part`
    protocol on failure)."""
    dataset_data = []
    try:
        for image_path in image_paths:
            with Image.open(str(image_path)) as the_image:
                data = {"file_name": str(image_path.relative_to(image_root))}
                data.update(gt_creator.determine_classes_in_image(the_image))
            dataset_data.append(data)
    except Exception:  # noqa: BLE001 — parity with reference bare except
        print(traceback.format_exc())
        return dataset_data, False
    return dataset_data, True


def main(args: argparse.Namespace) -> None:
    with open(args.config) as f:
        creation_config = json.load(f)

    if not args.only_create_train_val_split:
        build_dataset(args, creation_config, original_config_path=args.original_config_path)

    image_save_base_dir, _ = get_base_dirs(args)
    generated_images = list(iter_through_images_in(image_save_base_dir))
    random.seed(creation_config["seed"])
    random.shuffle(generated_images)

    coco_creator = COCOGtCreator(
        creation_config["class_to_color_map"], image_root=image_save_base_dir
    )

    split_index = int(len(generated_images) * 0.9)
    training_images = generated_images[:split_index]
    validation_images = generated_images[split_index:]

    training_gt, success = create_dataset_json_data(
        training_images, image_save_base_dir, coco_creator
    )
    with (image_save_base_dir / ("train.json" if success else "train.json.part")).open(
        "w"
    ) as f:
        json.dump(training_gt, f)

    validation_gt, success = create_dataset_json_data(
        validation_images, image_save_base_dir, coco_creator
    )
    with (image_save_base_dir / ("val.json" if success else "val.json.part")).open(
        "w"
    ) as f:
        json.dump(validation_gt, f)

    coco_gt = coco_creator.create_coco_gt_from_image_paths(validation_images)
    with (image_save_base_dir / "coco_gt.json").open("w") as f:
        json.dump(coco_gt, f)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Generate a synthetic dataset using a trained StyleGAN "
        "model and the labelled intermediate layers specified in a config file."
    )
    parser.add_argument("checkpoint", help="Path to trained generator checkpoint")
    parser.add_argument("config", help="path to json config for generation")
    parser.add_argument("-op", "--original-config-path", type=Path, default=None)
    parser.add_argument("-n", "--num-images", type=int, default=100)
    parser.add_argument("-s", "--save-to", default=None)
    parser.add_argument("-b", "--batch-size", default=10, type=int)
    parser.add_argument("--only-create-train-val-split", action="store_true",
                        default=False)
    parser.add_argument("--debug", action="store_true", default=False)
    parser.add_argument("--truncate", action="store_true", default=False)
    parser.add_argument(
        "--quantize",
        action="store_true",
        default=False,
        help="w8a8 int8 generator serving path (also creation-config key "
        "'quantize'); 1.2x synthesis throughput on v5e (MEASUREMENTS.md), "
        "bf16-faithful outputs (tests/test_quantized_synthesis.py)",
    )
    parser.add_argument(
        "--gray-fetch", action="store_true", default=False,
        help="fetch ONE luminance channel (1 B/px) from the device and "
        "replicate to RGB host-side — 3.1x smaller image transfer for "
        "grayscale-content generators (reference image_mode L); measured "
        "9.4 -> 3.1 ms/img at 256px/b16 over the dev relay",
    )
    parser.add_argument(
        "--contour-workers", type=int, default=0,
        help="worker processes for the host contour stage (0 = in-process); "
        "on a multi-core TPU host this scales the per-image contour/"
        "classify half independently of device synthesis",
    )
    parser.add_argument(
        "--device-contours", action="store_true", default=False,
        help="run the rasterized contour back half on the TPU inside one "
        "jitted program (segmentation.device_segmenter) — only 1-byte/px "
        "palette indices + drop flags transfer to the host; pixel-area "
        "thresholds differ slightly from the OpenCV polygon areas near "
        "the cutoff",
    )
    parser.add_argument(
        "--num-clusters",
        # ints for reference parity; also accepts a string tag naming a
        # composed catalog (catalogs/<tag>.npz from
        # scripts/select_cluster_config.py)
        type=lambda s: int(s) if s.lstrip("-").isdigit() else s,
        default=-1,
    )
    parser.add_argument("--classifier-path", default=None)
    parser.add_argument("-ssd", "--semantic-segmentation-base-dir", type=Path,
                        default=None)
    # reference create_dataset_for_segmentation.py:223-224 device flag,
    # accepted as a no-op (cli/compat.py)
    from synthesis_in_style_tpu.cli.compat import add_torch_compat_args

    add_torch_compat_args(parser, short_device=True, distributed=False)
    return parser


if __name__ == "__main__":
    from synthesis_in_style_tpu.cli.compat import warn_ignored_torch_args

    parsed = build_parser().parse_args()
    warn_ignored_torch_args(parsed)
    global_config.debug = parsed.debug
    main(parsed)
