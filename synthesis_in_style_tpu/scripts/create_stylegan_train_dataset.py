"""Build a StyleGAN training set from page scans: margin removal, random
downscaling, fixed-size patch crops, 90/10 split JSONs.

Capability parity with the reference
(/root/reference/stylegan_code_finder/scripts/create_stylegan_train_dataset.py):
content-box detection via Canny edges + dilate/erode with a largest-contour
area-gap heuristic (:49-113), bounding-box rescaling (:116-131), random 1-4x
downsample with a min side (:37-46), even-overlap patch grid (:18-34).

Usage:
  python -m synthesis_in_style_tpu.scripts.create_stylegan_train_dataset \
      <root_dir> <destination> <max_num_samples> --margin-remove
"""

from __future__ import annotations

import argparse
import json
import math
import random
from pathlib import Path
from typing import List

import cv2
import numpy as np
from PIL import Image

from synthesis_in_style_tpu.data.json_dataset import is_image


def crop_patches(image: Image.Image, image_size: int) -> List[Image.Image]:
    """Even-overlap tiling (reference crop_patches :18-34)."""
    windows_in_width = math.ceil(image.width / image_size)
    total_width_overlap = windows_in_width * image_size - image.width
    windows_in_height = math.ceil(image.height / image_size)
    total_height_overlap = windows_in_height * image_size - image.height
    width_overlap = total_width_overlap / windows_in_width
    height_overlap = total_height_overlap / windows_in_height

    patches = []
    for y_idx in range(windows_in_height):
        start_y = y_idx * (image_size - height_overlap)
        for x_idx in range(windows_in_width):
            start_x = x_idx * (image_size - width_overlap)
            patches.append(
                image.crop(
                    (start_x, start_y, start_x + image_size, start_y + image_size)
                )
            )
    return patches


def random_resize(image: Image.Image, min_size: int = 1000) -> Image.Image:
    """Random 1-4x downsample keeping a minimum side (reference :37-46)."""
    downsample_factor = random.randint(1, 4)
    new_size = max(image.width, image.height) / downsample_factor
    if new_size < min_size:
        new_size = min_size
    image.thumbnail((new_size, new_size))
    return image


def get_content_box(the_image: Image.Image, edge_detect: bool = True) -> List[int]:
    """Content bounding box of a scanned page (reference :49-113)."""
    full_box = [0, 0, the_image.width, the_image.height]
    if edge_detect:
        image = np.array(the_image)
        image = cv2.blur(image, (3, 3))
        thresh = cv2.Canny(image, 20, 150)
        kernel = cv2.getStructuringElement(cv2.MORPH_CROSS, (3, 3))
        thresh = cv2.dilate(thresh, kernel)
        thresh = cv2.erode(thresh, kernel, 2)
    else:
        gray = np.array(the_image.convert("L"))
        _, thresh = cv2.threshold(gray, 250, 255, cv2.THRESH_BINARY)

    contours, hierarchy = cv2.findContours(
        thresh, cv2.RETR_TREE, cv2.CHAIN_APPROX_SIMPLE
    )
    if hierarchy is None:
        return full_box
    hierarchy = hierarchy.reshape(-1, hierarchy.shape[-1])
    if len(hierarchy) == 1:
        return full_box

    sized = sorted(
        (
            (contour, rect[2] * rect[3])
            for contour in contours
            for rect in [cv2.boundingRect(contour)]
        ),
        key=lambda x: x[1],
        reverse=True,
    )
    differences = [
        abs(a[1] - b[1]) for a, b in zip(sized, sized[1:])
    ]
    contours, areas = zip(*sized)

    if thresh.size * 0.6 > areas[0]:
        # content region not large enough -> assume no scanning margin
        return full_box

    max_difference_index = differences.index(max(differences))
    kept = contours[: max_difference_index + 1]
    x, y, w, h = cv2.boundingRect(np.concatenate(kept, axis=0))
    return [x, y, x + w, y + h]


def scale_bounding_box(box, box_image_extent, new_image_extent) -> List[int]:
    """(reference :116-131)."""
    bw, bh = box_image_extent
    nw, nh = new_image_extent
    return [
        int(box[0] * nw / bw),
        int(box[1] * nh / bh),
        int(box[2] * nw / bw),
        int(box[3] * nh / bh),
    ]


def remove_scanning_margin(the_image: Image.Image) -> Image.Image:
    """(reference :134-141)."""
    analysis_image = the_image.copy()
    analysis_image.thumbnail((1000, 1000))
    box = get_content_box(analysis_image)
    crop_box = scale_bounding_box(box, analysis_image.size, the_image.size)
    return the_image.crop(crop_box)


def main(args: argparse.Namespace) -> None:
    root_dir = Path(args.root_dir)
    destination = Path(args.destination)
    destination.mkdir(exist_ok=True, parents=True)

    if not args.only_jsons:
        glob_filter = f"**/*{args.filter}*" if args.filter else "**/*"
        files = [f for f in root_dir.glob(glob_filter) if is_image(f)]
        num_files = min(len(files), args.max_num_samples)
        random.shuffle(files)

        patch_paths = []
        for idx, file_path in enumerate(files):
            dest_dir = destination / file_path.parent.relative_to(root_dir)
            dest_dir.mkdir(exist_ok=True, parents=True)
            try:
                with Image.open(str(file_path)) as the_image:
                    if args.margin_remove:
                        the_image = remove_scanning_margin(the_image)
                    if any(side > args.max_size for side in the_image.size):
                        the_image.thumbnail((args.max_size, args.max_size))
                    the_image = random_resize(the_image)
                    for patch_idx, patch in enumerate(
                        crop_patches(the_image, args.image_size)
                    ):
                        name = dest_dir / f"{file_path.stem}_{patch_idx}.png"
                        patch.save(str(name))
                        patch_paths.append(str(name.relative_to(destination)))
            except Exception as e:  # noqa: BLE001 — parity (ref :174-175)
                print(e)
            if idx + 1 >= num_files:
                break
    else:
        patch_paths = [
            str(f.relative_to(destination))
            for f in destination.glob("**/*")
            if is_image(f)
        ][: args.max_num_samples]

    random.shuffle(patch_paths)
    split_index = int(len(patch_paths) * 0.9)
    with (destination / "train.json").open("w") as f:
        json.dump(patch_paths[:split_index], f)
    with (destination / "val.json").open("w") as f:
        json.dump(patch_paths[split_index:], f)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Tool that crops parts from images to be used to train "
        "StyleGAN"
    )
    parser.add_argument("root_dir")
    parser.add_argument("destination")
    parser.add_argument("max_num_samples", type=int)
    parser.add_argument("--image-size", type=int, default=256)
    parser.add_argument("--only-jsons", action="store_true", default=False)
    parser.add_argument("--max-size", type=int, default=3000)
    parser.add_argument("--margin-remove", action="store_true", default=False)
    parser.add_argument("--filter", default=None)
    return parser


if __name__ == "__main__":
    main(build_parser().parse_args())
