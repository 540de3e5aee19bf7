"""Small image helpers (reference utils/image_utils.py:9-43): corner text
rendering for debug/plot output, PIL<->OpenCV conversion, aspect-preserving
resize."""

from __future__ import annotations

from typing import List

import cv2
import numpy as np
from PIL import Image, ImageDraw


def render_text_on_image(text: str, image: Image.Image) -> Image.Image:
    """Draw `text` on a white box in the bottom-right corner (reference
    :9-18)."""
    draw = ImageDraw.Draw(image)
    font = draw.getfont()
    bbox = draw.textbbox((0, 0), text, font=font)
    text_w, text_h = bbox[2] - bbox[0], bbox[3] - bbox[1]
    location = (
        image.width - text_w, image.height - text_h, image.width, image.height
    )
    draw.rectangle(location, fill=(255, 255, 255, 128))
    draw.text(location[:2], text, font=font, fill=(0, 255, 0), anchor="lt")
    return image


def pil_image_to_opencv(pil_image: Image.Image) -> np.ndarray:
    if pil_image.mode == "RGB":
        return cv2.cvtColor(np.array(pil_image), cv2.COLOR_RGB2BGR)
    if pil_image.mode == "L":
        return np.array(pil_image)
    raise NotImplementedError(pil_image.mode)


def opencv_image_to_pil(opencv_image: np.ndarray) -> Image.Image:
    return Image.fromarray(opencv_image)


def resize_image(image: Image.Image, new_dimensions: List[int]) -> Image.Image:
    """Resize to [height, width]; -1 keeps the aspect ratio (reference
    :34-43)."""
    assert any(size > 0 for size in new_dimensions), (
        "One of the given resize dimensions has to be greater than 0."
    )
    if new_dimensions[0] == -1:
        aspect_ratio = image.height / image.width
        new_dimensions = (int(new_dimensions[1] * aspect_ratio), new_dimensions[1])
    elif new_dimensions[1] == -1:
        aspect_ratio = image.width / image.height
        new_dimensions = (new_dimensions[0], int(new_dimensions[0] * aspect_ratio))
    return image.resize((new_dimensions[1], new_dimensions[0]), Image.LANCZOS)
