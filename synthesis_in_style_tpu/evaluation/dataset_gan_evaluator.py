"""DatasetGAN ensemble evaluation: dice coefficient over validation batches
(reference evaluation/dataset_gan_evaluator.py:9-61)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def calculate_dice_coefficient(pred, gt, smooth: float = 1e-5) -> float:
    """dice = (2 |pred ∩ gt| + s) / (|pred| + |gt| + s), mean over batch
    (reference :23-36)."""
    pred = jnp.asarray(pred, jnp.float32)
    gt = jnp.asarray(gt, jnp.float32)
    assert pred.shape == gt.shape, (
        "The shapes of prediction and groundtruth do not match."
    )
    n = pred.shape[0]
    pred_flat = pred.reshape(n, -1)
    gt_flat = gt.reshape(n, -1)
    intersection = jnp.sum(pred_flat * gt_flat, axis=1)
    union = jnp.sum(pred_flat, axis=1) + jnp.sum(gt_flat, axis=1)
    return float(jnp.mean((2 * intersection + smooth) / (union + smooth)))


def make_dataset_gan_eval_fn(ensemble, val_batches_fn):
    """eval_fn(trainer) computing the mean dice over validation pixel batches
    (reference DatasetGANEvaluator.evaluate :44-61 + DiceGANEvalFunc :9-20).
    `val_batches_fn()` yields {"activations": (B, F), "label": (B,)}."""

    def eval_fn(trainer):
        dice = 0.0
        num_batches = 0
        for batch in val_batches_fn():
            preds = ensemble.predict_classes(jnp.asarray(batch["activations"]))
            dice += calculate_dice_coefficient(
                preds[None].astype(jnp.float32),
                jnp.asarray(batch["label"])[None].astype(jnp.float32),
            )
            num_batches += 1
        if num_batches == 0:
            return {}
        return {"Dice Score": dice / num_batches}

    return eval_fn
