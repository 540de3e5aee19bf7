"""COCO ground-truth creation from side-by-side [image|mask] PNGs.

Capability parity with the reference
(/root/reference/stylegan_code_finder/segmentation/evaluation/coco_gt.py:15-135):
per-class RLE annotations, per-image `has_<class>` flags, and the full COCO
dict. pycocotools is not available in this image, so the compressed-RLE
codec (the public COCO maskApi format: Fortran-order run lengths,
delta + 5-bit-chunk signed varint, chars offset by 48) is implemented
natively in `rle_encode` / `rle_decode` — output is byte-compatible with
pycocotools.mask.encode.
"""

from __future__ import annotations

import datetime
import json
from pathlib import Path
from typing import Dict, Iterable, List, Tuple

import cv2
import numpy as np
from PIL import Image, ImageColor


def mask_to_rle_counts(mask: np.ndarray) -> List[int]:
    """Binary (H, W) mask -> COCO run lengths (column-major, starting with
    the zeros run)."""
    flat = np.asarray(mask, np.uint8).flatten(order="F")
    # positions where the value changes
    changes = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    boundaries = np.concatenate([[0], changes, [flat.size]])
    counts = np.diff(boundaries).tolist()
    if flat.size and flat[0] == 1:
        counts = [0] + counts
    if not counts:
        counts = [0]
    return counts


def rle_counts_to_string(counts: List[int]) -> str:
    """COCO compressed RLE (maskApi rleToString)."""
    chars = []
    for i, x in enumerate(counts):
        if i > 2:
            x -= counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            chars.append(chr(c + 48))
    return "".join(chars)


def rle_string_to_counts(s: str) -> List[int]:
    counts: List[int] = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[i]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return counts


def rle_encode(mask: np.ndarray) -> Dict:
    """(H, W) binary mask -> {'size': [H, W], 'counts': str}."""
    return {
        "size": [int(mask.shape[0]), int(mask.shape[1])],
        "counts": rle_counts_to_string(mask_to_rle_counts(mask)),
    }


def rle_decode(rle: Dict) -> np.ndarray:
    h, w = rle["size"]
    counts = (
        rle["counts"]
        if isinstance(rle["counts"], list)
        else rle_string_to_counts(rle["counts"])
    )
    flat = np.zeros(h * w, np.uint8)
    pos = 0
    val = 0
    for count in counts:
        flat[pos : pos + count] = val
        pos += count
        val = 1 - val
    return flat.reshape((h, w), order="F")


def rle_area(rle: Dict) -> int:
    counts = (
        rle["counts"]
        if isinstance(rle["counts"], list)
        else rle_string_to_counts(rle["counts"])
    )
    return int(sum(counts[1::2]))


def rle_to_bbox(rle: Dict) -> List[float]:
    """[x, y, w, h] of the mask's extent (pycocotools toBbox semantics)."""
    mask = rle_decode(rle)
    ys, xs = np.nonzero(mask)
    if len(xs) == 0:
        return [0.0, 0.0, 0.0, 0.0]
    x0, x1 = xs.min(), xs.max()
    y0, y1 = ys.min(), ys.max()
    return [float(x0), float(y0), float(x1 - x0 + 1), float(y1 - y0 + 1)]


def _polygon_to_rle(polygon: np.ndarray, height: int, width: int) -> Dict:
    canvas = np.zeros((height, width), np.uint8)
    cv2.fillPoly(canvas, [polygon.reshape(-1, 2).astype(np.int32)], 1)
    return rle_encode(canvas)


class COCOGtCreator:
    """Reference COCOGtCreator (coco_gt.py:15-135)."""

    def __init__(self, class_to_color_map: Dict, image_root: Path = Path("/")):
        self.class_to_color_map = class_to_color_map
        self.categories = self.build_categories()
        self.image_root = Path(image_root)

    def build_categories(self) -> List[dict]:
        return [
            {
                "id": category_id,
                "name": class_name,
                "supercategory": class_name,
                "color": color,
            }
            for category_id, (class_name, color) in enumerate(
                self.class_to_color_map.items()
            )
        ]

    @staticmethod
    def get_label_image(image_data: Image.Image) -> np.ndarray:
        arr = np.array(image_data)
        _, label_image = np.split(arr, 2, axis=1)
        return label_image

    @staticmethod
    def _class_mask(label_image: np.ndarray, color) -> np.ndarray:
        if isinstance(color, str):
            color = ImageColor.getrgb(color)
        return np.multiply.reduce(
            label_image[:, :] == np.asarray(color), axis=2
        ).astype(np.uint8)

    @staticmethod
    def extract_rles(class_mask: np.ndarray) -> List[Dict]:
        """Per-contour RLEs (reference extract_rle :39-49: external contours
        with >= 3 points, rasterized)."""
        contours, _ = cv2.findContours(
            class_mask.astype(np.uint8), cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
        )
        h, w = class_mask.shape[-2:]
        return [
            _polygon_to_rle(c, h, w) for c in contours if c.size >= 6
        ]

    def determine_classes_in_image(self, image_data: Image.Image) -> Dict[str, bool]:
        """`has_<class>` flags (reference :51-66)."""
        label_image = self.get_label_image(image_data)
        classes_in_image = {}
        for class_name, color in self.class_to_color_map.items():
            if class_name == "background":
                continue
            mask = self._class_mask(label_image, color)
            rles = self.extract_rles(mask)
            classes_in_image[f"has_{class_name}"] = len(rles) > 0
        return classes_in_image

    def build_annotations_for_image(
        self, image_data: Image.Image, image_id: int, annotation_id: int
    ) -> Tuple[List[dict], int]:
        label_image = self.get_label_image(image_data)
        annotations = []
        for class_id, (class_name, color) in enumerate(
            self.class_to_color_map.items()
        ):
            if class_name == "background":
                continue
            mask = self._class_mask(label_image, color)
            for rle in self.extract_rles(mask):
                annotations.append(
                    {
                        "id": annotation_id,
                        "image_id": image_id,
                        "category_id": class_id,
                        "segmentation": rle,
                        "area": rle_area(rle),
                        "bbox": rle_to_bbox(rle),
                        "iscrowd": 0,
                    }
                )
                annotation_id += 1
        return annotations, annotation_id

    def create_coco_gt_from_image_paths(self, image_paths: Iterable[Path]) -> dict:
        images = []
        annotations = []
        annotation_id = 0
        for i, image_path in enumerate(image_paths):
            with Image.open(str(image_path)) as the_image:
                images.append(
                    {
                        "id": i,
                        "width": the_image.width // 2,
                        "height": the_image.height,
                        "file_name": str(Path(image_path).relative_to(self.image_root)),
                        "license": 0,
                        "flickr_url": "",
                        "coco_url": "",
                        "date_captured": str(
                            datetime.datetime.now(datetime.timezone.utc)
                        ),
                    }
                )
                anns, annotation_id = self.build_annotations_for_image(
                    the_image, i, annotation_id
                )
                annotations.extend(anns)
        return {
            "info": {
                "year": datetime.date.today().year,
                "version": "1",
                "description": "COCO GT for evaluation of semantic segmentation",
                "contributor": "synthesis_in_style_tpu",
                "url": "http://example.com",
            },
            "images": images,
            "annotations": annotations,
            "categories": self.categories,
            "licenses": [{"id": 0, "name": "synthetic", "url": "http://example.com"}],
        }


def iter_through_images_in(image_root: Path, extension: str = "png") -> Iterable[Path]:
    yield from sorted(Path(image_root).glob(f"**/*.{extension}"))


def create_coco_gt_from_image_root(image_root: Path, class_to_color_map: Dict) -> Path:
    creator = COCOGtCreator(class_to_color_map, image_root=image_root)
    coco_gt = creator.create_coco_gt_from_image_paths(
        iter_through_images_in(image_root)
    )
    out = Path(image_root) / "coco_gt.json"
    with out.open("w") as f:
        json.dump(coco_gt, f)
    return out
