"""Segmenter prediction layer: softmax → confidence threshold → small-contour
removal → class decision.

Capability parity with the reference `BaseSegmenter`
(/root/reference/stylegan_code_finder/networks/base_segmenter.py:11-66),
re-designed for TPU:

* The reference is an nn.Module base class whose `predict()` runs
  softmax + threshold on GPU, then round-trips through OpenCV per image and
  per class for the contour-area filter (:25-45).
* Here the models are pure flax modules; prediction is a thin functional
  layer: `predict_probabilities` (softmax + threshold) stays on device and is
  jittable, and `remove_too_small_contours` is an explicit host-side numpy/cv2
  step — batched once instead of the reference's tensor.clone-per-image.

`SegmenterConfig` carries the reference's per-model postprocess defaults
(background_class_id, min_confidence, min_contour_area).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class SegmenterConfig:
    """Postprocess hyperparameters (reference BaseSegmenter.__init__,
    base_segmenter.py:17-23; DocUFCN defaults doc_ufcn.py:13-15)."""

    num_classes: int
    background_class_id: int = 0
    min_confidence: float = 0.0
    min_contour_area: int = 0
    num_input_channels: int = 3


def predict_probabilities(
    logits: Array, min_confidence: float = 0.0
) -> Array:
    """Softmax over the class axis (last, NHWC) with sub-threshold confidences
    zeroed (reference predict + postprocess thresholding,
    base_segmenter.py:46-57). Jittable, stays on device."""
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.where(probs < min_confidence, 0.0, probs)


def get_contours_from_prediction(class_prediction: np.ndarray):
    """Morphological-close then external contours of one (H, W) confidence
    map (reference utils/segmentation_utils.py get_contours_from_prediction,
    :88-104). Returns None if the map is empty."""
    import cv2

    scaled = (np.asarray(class_prediction, np.float32) * 255).astype(np.uint8)
    closed = cv2.morphologyEx(scaled, cv2.MORPH_CLOSE, np.ones((5, 5), np.uint8))
    nonzero = closed != 0
    if not nonzero.any():
        return None
    contours, _ = cv2.findContours(
        (nonzero * 255).astype(np.uint8), cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE
    )
    return contours


def remove_too_small_contours(
    predictions: np.ndarray,
    min_contour_area: int,
    background_class_id: int = 0,
) -> np.ndarray:
    """Zero out connected regions with contour area < min_contour_area
    (reference remove_too_small_contours, base_segmenter.py:25-45, per the
    DocUFCN paper). predictions: (B, H, W, C) probabilities, host numpy."""
    import cv2

    if min_contour_area <= 0:
        return predictions
    out = np.array(predictions, copy=True)
    for image_id in range(out.shape[0]):
        for class_id in range(out.shape[-1]):
            if class_id == background_class_id:
                continue
            contours = get_contours_from_prediction(out[image_id, :, :, class_id])
            if contours is None:
                continue
            keep_mask = np.ones(out.shape[1:3], dtype=np.uint8)
            for contour in contours:
                if cv2.contourArea(contour) < min_contour_area:
                    keep_mask = cv2.fillPoly(keep_mask, [contour], 0)
            out[image_id, :, :, class_id] *= keep_mask
    return out


def predict(
    logits: Array,
    config: SegmenterConfig,
) -> np.ndarray:
    """Full reference `predict` pipeline (base_segmenter.py:54-57):
    softmax → confidence threshold (device) → contour filter (host).
    Returns (B, H, W, C) float32 numpy probabilities."""
    probs = np.asarray(predict_probabilities(logits, config.min_confidence))
    return remove_too_small_contours(
        probs, config.min_contour_area, config.background_class_id
    )


def predict_classes(
    logits: Array,
    config: SegmenterConfig,
) -> np.ndarray:
    """Argmax of the postprocessed probabilities, (B, H, W) int
    (reference predict_classes, base_segmenter.py:59-62)."""
    return np.argmax(predict(logits, config), axis=-1)
