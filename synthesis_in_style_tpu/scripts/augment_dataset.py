"""Offline dataset augmentation CLI.

Parity with the reference's standalone tool
(/root/reference/stylegan_code_finder/utils/augment_dataset.py:87-112): each
input file is a side-by-side page ``[original | segmentation]``; the tool
splits it, produces ``-n`` independently augmented pairs through the shared
:mod:`synthesis_in_style_tpu.utils.augmentation` pipeline (geometric ops
applied identically to image and mask, color ops to the image only), and
writes them back side-by-side as ``<stem>_aug_<i><suffix>`` under
``--save-dir``, preserving the sub-directory layout (reference
save_image_batches, augment_dataset.py:75-85).

Deviations, on purpose:
  * the reference's ``main`` only processes ``image_paths[:10]`` (a leftover
    debug slice, augment_dataset.py:89); this tool processes the whole tree
    and exposes ``--limit`` for the old behavior.
  * ``--show`` saved-to-screen previews become ``--preview-dir`` (headless
    hosts have no display): the same unaugmented-on-top column montage the
    reference composed is written as a PNG instead.
  * work fans out over a thread pool — the OpenCV augmentation kernels
    release the GIL, so this scales on multi-core hosts.
"""

from __future__ import annotations

import argparse
import threading
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import List, Tuple

import numpy as np
from PIL import Image

from synthesis_in_style_tpu.utils.augmentation import augment_image

IMAGE_SUFFIXES = {".png", ".jpg", ".jpeg", ".bmp", ".tiff", ".tif", ".webp"}


def is_image(path: Path) -> bool:
    return path.is_file() and path.suffix.lower() in IMAGE_SUFFIXES


def split_side_by_side(page: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """[original | segmentation] -> (original, segmentation); reference
    main() crops at width // 2 (augment_dataset.py:91-93)."""
    half = page.shape[1] // 2
    return page[:, :half], page[:, half : 2 * half]


def combine_side_by_side(image: np.ndarray, mask: np.ndarray) -> np.ndarray:
    return np.concatenate([image, mask], axis=1)


def preview_montage(
    image: np.ndarray, mask: np.ndarray, pairs: List[Tuple[np.ndarray, np.ndarray]]
) -> np.ndarray:
    """Unaugmented pair on top, each augmented pair below (the layout of the
    reference's --show montage, augment_dataset.py:60-65)."""
    rows = [combine_side_by_side(image, mask)]
    rows += [combine_side_by_side(im, ma) for im, ma in pairs]
    return np.concatenate(rows, axis=0)


def augment_one_file(
    image_path: Path,
    dataset_dir: Path,
    save_dir: Path | None,
    num_augmented: int,
    seed: int,
    preview_dir: Path | None = None,
) -> int:
    page = np.asarray(Image.open(image_path).convert("RGB"))
    image, mask = split_side_by_side(page)
    rng = np.random.default_rng(seed)
    pairs = augment_image(image, mask, num_augmented, rng=rng)

    if save_dir is not None:
        out_dir = save_dir / image_path.relative_to(dataset_dir).parent
        out_dir.mkdir(parents=True, exist_ok=True)
        for i, (aug_image, aug_mask) in enumerate(pairs):
            out = combine_side_by_side(aug_image, aug_mask)
            Image.fromarray(out).save(
                out_dir / f"{image_path.stem}_aug_{i + 1}{image_path.suffix}"
            )
    if preview_dir is not None:
        preview_dir.mkdir(parents=True, exist_ok=True)
        Image.fromarray(preview_montage(image, mask, pairs)).save(
            preview_dir / f"{image_path.stem}_preview.png"
        )
    return len(pairs) if save_dir is not None else 0


def main(args: argparse.Namespace) -> None:
    image_paths = sorted(f for f in args.dataset_dir.glob("**/*") if is_image(f))
    if args.limit is not None:
        image_paths = image_paths[: args.limit]
    if args.save_dir is None and args.preview_dir is None:
        raise SystemExit("nothing to do: pass --save-dir and/or --preview-dir")

    progress = {"done": 0}
    lock = threading.Lock()

    def work(item: Tuple[int, Path]) -> int:
        idx, path = item
        n = augment_one_file(
            path,
            args.dataset_dir,
            args.save_dir,  # None => preview-only run, write no pairs
            args.num_augmented_images,
            seed=args.seed + idx,
            preview_dir=args.preview_dir,
        )
        with lock:
            progress["done"] += 1
            if progress["done"] % 50 == 0:
                print(f"{progress['done']}/{len(image_paths)} pages augmented")
        return n

    with ThreadPoolExecutor(max_workers=args.workers) as pool:
        total = sum(pool.map(work, enumerate(image_paths)))
    print(f"wrote {total} augmented pairs for {len(image_paths)} pages")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Produce an augmented copy of a side-by-side "
        "[image | segmentation] dataset (ElasticTransform, Shear, CropAndPad, "
        "translation, rotation, GammaContrast, inversion)."
    )
    parser.add_argument("dataset_dir", type=Path, help="top-level dataset directory")
    parser.add_argument(
        "-n", "--num-augmented-images", type=int, default=3,
        help="augmented copies per input page",
    )
    parser.add_argument("--save-dir", type=Path, help="output directory")
    parser.add_argument(
        "--preview-dir", type=Path,
        help="also write per-page montage previews here (headless --show)",
    )
    parser.add_argument("--limit", type=int, default=None, help="only first N pages")
    parser.add_argument("--seed", type=int, default=0, help="base RNG seed")
    parser.add_argument("--workers", type=int, default=8, help="thread pool size")
    return parser


if __name__ == "__main__":
    main(build_parser().parse_args())
