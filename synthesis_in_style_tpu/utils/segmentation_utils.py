"""Shared segmentation utilities: bounding boxes, color<->class maps.

Behavior parity with reference utils/segmentation_utils.py (BBox :21-64,
get_class_id_map :124-134, segmentation_image_to_class_image :137-157), with
the color->class conversion vectorized to one pass."""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Tuple, Union

import numpy as np
from PIL import ImageColor

Color = Tuple[int, int, int]


class BBox(NamedTuple):
    left: int
    top: int
    right: int
    bottom: int

    @classmethod
    def from_bounding_rect(cls, x, y, width, height):
        return cls(x, y, x + width, y + height)

    @property
    def width(self) -> int:
        return self.right - self.left

    @property
    def height(self) -> int:
        return self.bottom - self.top

    def is_overlapping_with(self, other: "BBox") -> bool:
        return (
            self.left < other.right
            and self.right > other.left
            and self.top < other.bottom
            and self.bottom > other.top
        )

    def get_mutual_bbox(self, other: "BBox") -> "BBox":
        return BBox(
            min(self.left, other.left),
            min(self.top, other.top),
            max(self.right, other.right),
            max(self.bottom, other.bottom),
        )


def resolve_color_map(class_to_color_map: Dict[str, Union[str, Color]]) -> Dict[str, Color]:
    """'#rrggbb' / color-name strings -> RGB tuples (reference
    base_dataset_segmenter.py:26-27)."""
    return {
        name: (ImageColor.getrgb(color) if isinstance(color, str) else tuple(color))
        for name, color in class_to_color_map.items()
    }


def get_class_id_map(
    class_to_color_map: Dict[str, object], background_class_name: str = "background"
) -> Dict[str, int]:
    """Class name -> id with background pinned to 0 (reference :124-134)."""
    assert background_class_name in class_to_color_map
    class_id_map = {background_class_name: 0}
    others = [n for n in class_to_color_map if n != background_class_name]
    class_id_map.update({name: i + 1 for i, name in enumerate(others)})
    return class_id_map


def segmentation_image_to_class_image(
    segmentation_image: np.ndarray,
    class_to_color_map: Dict[str, Union[str, Color]],
    background_class_name: str = "background",
) -> np.ndarray:
    """(H, W, 3) color mask -> (H, W) class ids. Vectorized single pass
    (reference loops per class, :137-157)."""
    color_map = resolve_color_map(class_to_color_map)
    class_id_map = get_class_id_map(color_map, background_class_name)
    class_image = np.zeros(segmentation_image.shape[:2], dtype=segmentation_image.dtype)
    for class_name, color in color_map.items():
        if class_name == background_class_name:
            continue
        mask = np.all(segmentation_image == np.asarray(color), axis=2)
        class_image[mask] = class_id_map[class_name]
    return class_image


def class_image_to_segmentation_image(
    class_image: np.ndarray,
    class_to_color_map: Dict[str, Union[str, Color]],
    background_class_name: str = "background",
) -> np.ndarray:
    """(H, W) class ids -> (H, W, 3) color mask (inverse of the above)."""
    color_map = resolve_color_map(class_to_color_map)
    class_id_map = get_class_id_map(color_map, background_class_name)
    lut = np.zeros((len(class_id_map), 3), np.uint8)
    for name, idx in class_id_map.items():
        lut[idx] = color_map[name]
    return lut[class_image]


def bounding_rects_from_contours(contours: List[np.ndarray]) -> np.ndarray:
    """(n, 4) array of x, y, w, h (reference bounding_rect_from_contours,
    :67-71)."""
    import cv2

    return np.asarray([cv2.boundingRect(c) for c in contours]).reshape(-1, 4)
