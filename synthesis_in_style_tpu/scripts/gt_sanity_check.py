"""Validate and postprocess segmentation ground-truth color masks
(reference utils/gt_sanity_check.py): flag pixels outside the allowed color
palette (optionally highlighting them) and paint-over tiny single-color
noise contours.

Usage:
  python -m synthesis_in_style_tpu.scripts.gt_sanity_check <image_dir> \
      -cc -he -p --out-dir tmp
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import Set, Tuple

import cv2
import numpy as np
from PIL import Image, UnidentifiedImageError

ALLOWED_COLORS = {
    (0, 0, 0),
    (255, 0, 0),
    (0, 0, 255),
}


def highlight_errors_in_image(
    image_array: np.ndarray,
    invalid_colors: Set[Tuple],
    error_color: Tuple = (0, 255, 0),
) -> Image.Image:
    """(reference :17-24)."""
    highlighted = image_array.copy()
    for color in invalid_colors:
        ys, xs = np.where(np.all(image_array == color, axis=-1))
        highlighted[ys, xs] = error_color
    return Image.fromarray(highlighted)


def check_colors(
    image_array: np.ndarray,
    highlight_errors: bool = False,
    image_path: Path = None,
    out_dir: Path = None,
) -> Set[Tuple]:
    """(reference :27-39). Returns the invalid colors found."""
    unique = np.unique(image_array.reshape(-1, image_array.shape[-1]), axis=0)
    invalid = {tuple(int(x) for x in c) for c in unique} - ALLOWED_COLORS
    if invalid:
        print(f"{image_path} contains the following invalid colors: {invalid}")
        if highlight_errors:
            assert image_path is not None and out_dir is not None, (
                "If errors should be highlighted, the required paths have to "
                "be set"
            )
            out_path = Path(out_dir) / (
                f"{image_path.stem}_highlighted{image_path.suffix}"
            )
            out_path.parent.mkdir(parents=True, exist_ok=True)
            highlight_errors_in_image(image_array, invalid).save(str(out_path))
    return invalid


def postprocess_images(
    image_array: np.ndarray, image_path: Path, out_dir: Path,
    max_contour_area: int = 7,
) -> Path:
    """Paint over tiny single-color contours (reference :42-59)."""
    bgr = cv2.cvtColor(image_array, cv2.COLOR_RGB2BGR)
    gray = cv2.cvtColor(bgr, cv2.COLOR_BGR2GRAY)
    contours, _ = cv2.findContours(gray, cv2.RETR_LIST, cv2.CHAIN_APPROX_NONE)

    small = []
    for contour in contours:
        if cv2.contourArea(contour) < max_contour_area:
            mask = np.zeros(bgr.shape[:2], np.uint8)
            cv2.drawContours(mask, [contour], -1, 255, thickness=cv2.FILLED)
            mean = cv2.mean(bgr, mask=mask)
            if mean[:3] in ALLOWED_COLORS:
                small.append(contour)

    cv2.drawContours(bgr, small, -1, color=(255, 0, 255), thickness=cv2.FILLED)
    out_path = Path(out_dir) / f"{image_path.stem}_post{image_path.suffix}"
    cv2.imwrite(str(out_path), bgr)
    return out_path


def main(args: argparse.Namespace) -> None:
    if not (args.check_colors or args.postprocess):
        print(
            "You should pass at least one of the following arguments to the "
            "script: --check-colors, --postprocess"
        )
        return
    for image_path in sorted(args.image_dir.iterdir()):
        args.out_dir.mkdir(exist_ok=True, parents=True)
        try:
            image_array = np.array(Image.open(image_path).convert("RGB"))
        except UnidentifiedImageError:
            continue
        if args.check_colors:
            check_colors(image_array, args.highlight_errors, image_path,
                         args.out_dir)
        if args.postprocess:
            postprocess_images(image_array, image_path, out_dir=args.out_dir)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Script that checks if the ground truth for segmented "
        "documents is valid and postprocesses it."
    )
    parser.add_argument("image_dir", type=Path)
    parser.add_argument("-cc", "--check-colors", action="store_true",
                        default=False)
    parser.add_argument("-he", "--highlight-errors", action="store_true",
                        default=False)
    parser.add_argument("-p", "--postprocess", action="store_true",
                        default=False)
    parser.add_argument("--out-dir", type=Path, default=Path("tmp"))
    return parser


if __name__ == "__main__":
    main(build_parser().parse_args())
