"""Segmentation losses: weighted cross-entropy and multi-class Dice.

Behavior parity with the reference training losses:
  * weighted pixel CE — reference StandardUpdater
    (updater/segmentation_updater.py:11-39) flattens predictions to
    (B*H*W, C) and applies `nn.CrossEntropyLoss(weight=class_weights)`.
  * Dice — reference DiceLoss (networks/trans_u_net/utils.py:7-43):
    per-class soft dice with both intersection and sums squared-free,
    averaged over classes (background included), smooth=1e-5.

All functions take NHWC logits of shape (B, H, W, C) and integer labels
(B, H, W) and compute in float32 regardless of input dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def cross_entropy_loss(
    logits: Array,
    labels: Array,
    class_weights: Optional[Array] = None,
) -> Array:
    """Mean (optionally class-weighted) softmax cross-entropy over pixels.

    With weights, the mean is weighted by the per-pixel class weight —
    matching torch CrossEntropyLoss(weight=...) normalization
    (sum(w_i * ce_i) / sum(w_i))."""
    logits = logits.astype(jnp.float32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(
        log_probs, labels[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    nll = -picked
    if class_weights is None:
        return jnp.mean(nll)
    w = jnp.asarray(class_weights, jnp.float32)[labels]
    return jnp.sum(w * nll) / jnp.sum(w)


def dice_loss(
    logits: Array,
    labels: Array,
    num_classes: int,
    apply_softmax: bool = True,
    smooth: float = 1e-5,
) -> Array:
    """Soft multi-class Dice loss (reference trans_u_net/utils.py:7-43):
    1 - dice per class, averaged over all classes."""
    probs = logits.astype(jnp.float32)
    if apply_softmax:
        probs = jax.nn.softmax(probs, axis=-1)
    one_hot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    # reduce over batch + spatial dims -> per-class scalars
    axes = tuple(range(probs.ndim - 1))
    intersect = jnp.sum(probs * one_hot, axis=axes)
    denom = jnp.sum(jnp.square(one_hot), axis=axes) + jnp.sum(
        jnp.square(probs), axis=axes
    )
    dice = (2.0 * intersect + smooth) / (denom + smooth)
    return jnp.mean(1.0 - dice)
