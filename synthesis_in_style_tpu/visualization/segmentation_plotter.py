"""Input / ground-truth / prediction triptych rendering (reference
visualization/segmentation_plotter.py:11-42 SegmentationPlotter). Pure render
function used through `core.extensions.ImagePlotter`."""

from __future__ import annotations

from typing import Dict

import numpy as np

from synthesis_in_style_tpu.utils.segmentation_utils import (
    class_image_to_segmentation_image,
)
from synthesis_in_style_tpu.visualization.utils import network_output_to_color_image


def render_segmentation_grid(
    input_images: np.ndarray,
    label_images: np.ndarray,
    predictions: np.ndarray,
    class_to_color_map: Dict,
) -> np.ndarray:
    """Rows: [input | GT color mask | predicted color mask] per sample.

    input_images: (B, H, W, C) in [-1, 1]; label_images: (B, H, W) int;
    predictions: (B, H, W, num_classes) confidences. Returns one uint8 grid.
    """
    inputs = np.clip((np.asarray(input_images) + 1.0) * 127.5, 0, 255).astype(
        np.uint8
    )
    if inputs.shape[-1] == 1:
        inputs = np.repeat(inputs, 3, axis=-1)
    gts = np.stack(
        [
            class_image_to_segmentation_image(np.asarray(lbl), class_to_color_map)
            for lbl in label_images
        ]
    )
    preds = network_output_to_color_image(predictions, class_to_color_map)
    rows = [np.concatenate([i, g, p], axis=1) for i, g, p in zip(inputs, gts, preds)]
    return np.concatenate(rows, axis=0)
