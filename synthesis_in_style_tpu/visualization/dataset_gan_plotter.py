"""DatasetGAN plotter: input image / GT labels / ensemble prediction grid
(reference visualization/dataset_gan_plotter.py:10-45)."""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from synthesis_in_style_tpu.utils.segmentation_utils import (
    class_image_to_segmentation_image,
)


def render_dataset_gan_grid(
    images: np.ndarray,
    pixel_activations: np.ndarray,
    label_images: np.ndarray,
    ensemble,
    class_to_color_map: Dict,
) -> np.ndarray:
    """Rows: [generated image | GT color mask | ensemble prediction]."""
    rows = []
    for image, acts, labels in zip(images, pixel_activations, label_images):
        h, w, f = acts.shape
        pred = np.asarray(
            ensemble.predict_classes(jnp.asarray(acts.reshape(-1, f)))
        ).reshape(h, w)
        gt_color = class_image_to_segmentation_image(
            np.asarray(labels).astype(np.int64), class_to_color_map
        )
        pred_color = class_image_to_segmentation_image(pred, class_to_color_map)
        image = np.asarray(image)
        if image.shape[:2] != (h, w):
            from PIL import Image

            image = np.asarray(Image.fromarray(image).resize((w, h)))
        rows.append(np.concatenate([image, gt_color, pred_color], axis=1))
    return np.concatenate(rows, axis=0)
