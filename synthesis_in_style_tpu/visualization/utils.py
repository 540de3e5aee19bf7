"""Prediction → color image rendering.

Capability parity with reference visualization/utils.py:9-97
(`linear_gradient`, `network_output_to_color_image` incl. the
confidence-gradient mode), numpy NHWC instead of torch NCHW; returns uint8
images ready for PIL."""

from __future__ import annotations

from typing import Dict, List, Tuple, Union

import numpy as np
from PIL import ImageColor

Color = Tuple[int, int, int]


def _rgb(color: Union[str, Tuple[int, ...]]) -> Color:
    return ImageColor.getrgb(color) if isinstance(color, str) else tuple(color)


def linear_gradient(start_rgb: Color, finish_rgb: Color, n: int = 10) -> List[Color]:
    """n evenly spaced colors from start to finish (reference :9-26)."""
    colors = [start_rgb]
    for t in range(1, n):
        colors.append(
            tuple(
                int(start_rgb[j] + (float(t) / (n - 1)) * (finish_rgb[j] - start_rgb[j]))
                for j in range(3)
            )
        )
    return colors


def network_output_to_color_image(
    network_outputs: np.ndarray,
    class_to_color_map: Dict,
    show_confidence_in_segmentation: bool = False,
) -> np.ndarray:
    """(B, H, W, C) class confidences -> (B, H, W, 3) uint8 color images
    (reference :29-97). With show_confidence_in_segmentation, non-background
    pixels are shaded white→class-color by their confidence."""
    network_outputs = np.asarray(network_outputs)
    batch_size, height, width, num_predicted_classes = network_outputs.shape
    assert num_predicted_classes == len(class_to_color_map), (
        "Number of predicted classes and expected classes does not match "
        f"{num_predicted_classes} vs {len(class_to_color_map)}"
    )
    out = np.zeros((batch_size, height, width, 3), np.uint8)
    out[:, :, :] = _rgb(class_to_color_map["background"])

    if show_confidence_in_segmentation:
        steps = 100
        gradients = [
            linear_gradient((255, 255, 255), _rgb(color), steps)
            for color in class_to_color_map.values()
        ]
        gradient_luts = np.asarray(gradients, np.uint8)  # (C, steps, 3)
        not_background = network_outputs[..., 1:].sum(axis=-1) > 0
        class_idx = np.argmax(network_outputs, axis=-1)
        strength = np.max(network_outputs, axis=-1)
        strength_idx = np.clip(
            (steps * strength).astype(np.int64) - 1, 0, steps - 1
        )
        shaded = gradient_luts[class_idx, strength_idx]
        out[not_background] = shaded[not_background]
    else:
        predicted = np.argmax(network_outputs, axis=-1)
        for class_id, (class_name, color) in enumerate(class_to_color_map.items()):
            if class_name == "background":
                continue
            out[predicted == class_id] = _rgb(color)
    return out
