"""Confusion-matrix segmentation metrics: dice / IoU / precision / recall.

Capability parity with the reference
(/root/reference/stylegan_code_finder/segmentation/evaluation/segmentation_metric_calculation.py:25-129),
with the O(C^2) masked-sum loop (:72-95) replaced by ONE one-hot matmul on
device: confusion[i, j] = sum over pixels of onehot_gt[i] * onehot_pred[j].

The nan→1.0 convention is preserved: a class absent from both prediction and
ground truth scores 1.0 (reference :31-61)."""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def calculate_confusion_matrix(
    ground_truth, prediction, num_classes: int
) -> np.ndarray:
    """(H, W) or (B, H, W) integer class maps -> (C, C) matrix with
    rows = ground truth, cols = prediction (reference :72-95)."""
    # exact integer counts via bincount of the joint index — a float32
    # one-hot matmul would silently stop counting once any cell exceeds
    # 2^24 pixels (one large page scan is enough); int32 is exact to 2^31
    gt = jnp.asarray(ground_truth).reshape(-1).astype(jnp.int32)
    pred = jnp.asarray(prediction).reshape(-1).astype(jnp.int32)
    joint = gt * num_classes + pred
    counts = jnp.bincount(joint, length=num_classes * num_classes)
    matrix = np.asarray(counts, np.int64).reshape(num_classes, num_classes)
    return matrix.astype(np.float64)


def _nan_to_one(value: float) -> float:
    return 1.0 if np.isnan(value) else float(value)


def calculate_dice_score(confusion_matrix: np.ndarray, class_idx: int) -> float:
    tp = confusion_matrix[class_idx, class_idx]
    predicted = confusion_matrix[:, class_idx].sum()
    actual = confusion_matrix[class_idx, :].sum()
    with np.errstate(invalid="ignore"):
        return _nan_to_one(2 * tp / (predicted + actual))


def calculate_iou(confusion_matrix: np.ndarray, class_idx: int) -> float:
    tp = confusion_matrix[class_idx, class_idx]
    predicted = confusion_matrix[:, class_idx].sum()
    actual = confusion_matrix[class_idx, :].sum()
    with np.errstate(invalid="ignore"):
        return _nan_to_one(tp / (predicted + actual - tp))


def calculate_precision(confusion_matrix: np.ndarray, class_idx: int) -> float:
    tp = confusion_matrix[class_idx, class_idx]
    predicted = confusion_matrix[:, class_idx].sum()
    with np.errstate(invalid="ignore", divide="ignore"):
        return _nan_to_one(tp / predicted)


def calculate_recall(confusion_matrix: np.ndarray, class_idx: int) -> float:
    tp = confusion_matrix[class_idx, class_idx]
    actual = confusion_matrix[class_idx, :].sum()
    with np.errstate(invalid="ignore", divide="ignore"):
        return _nan_to_one(tp / actual)


IMPLEMENTED_METRICS = {
    "dice": calculate_dice_score,
    "iou": calculate_iou,
    "precision": calculate_precision,
    "recall": calculate_recall,
}


def calculate_metric(
    confusion_matrix: np.ndarray, class_names: List[str], metric: str = "dice"
) -> Dict[str, Dict[str, float]]:
    """Per-class scores + gt-frequency-weighted averages, including the
    text-classes-only weighted average (reference :98-129)."""
    assert metric in IMPLEMENTED_METRICS, (
        f"Metric to calculate must be in {', '.join(IMPLEMENTED_METRICS)}"
    )
    confusion_matrix = np.asarray(confusion_matrix, np.float64)
    scores: Dict[str, Dict[str, float]] = {
        "weighted_avg": {"score": 0.0},
        "weighted_text_avg": {"score": 0.0},
    }
    total_text_weight = 0.0
    total = confusion_matrix.sum()
    for class_idx, name in enumerate(class_names):
        score = IMPLEMENTED_METRICS[metric](confusion_matrix, class_idx)
        weight = confusion_matrix[class_idx, :].sum() / total if total else 0.0
        if "text" in name:
            total_text_weight += weight
        scores["weighted_avg"]["score"] += score * weight
        scores[name] = {"score": score, "weight": weight}

    for name in class_names:
        if "text" in name:
            if total_text_weight > 0:
                scores["weighted_text_avg"]["score"] += (
                    scores[name]["score"] * scores[name]["weight"] / total_text_weight
                )
            else:
                scores["weighted_text_avg"]["score"] = 1.0
    return scores
