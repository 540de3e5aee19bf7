"""Connected components on device — the rasterized alternative to the
OpenCV contour machinery (SURVEY.md §7 "hard parts": connected-component
labeling as iterative label propagation, iterations bounded by the image
diameter).

Algorithm: seed every foreground pixel with its linear index, then repeat
{propagate the minimum label across contiguous row runs, then column runs}
until a fixpoint (`lax.while_loop`, bounded by H + W sweeps — each sweep
moves a label across an entire straight run, so convergence needs one sweep
per "bend" of the most snake-like component, itself bounded by the
diameter). Each run-propagation is one `lax.associative_scan` over a
(min-so-far, reset) segmented-min operator — fully vectorized over the
batch, no per-pixel host loops.

`filter_small_components` reproduces the effect of the reference's
remove-too-small-contours postprocess (base_segmenter.py:25-45) with
pixel-area semantics (cv2.contourArea measures the polygon, which for filled
blobs differs from the pixel count by ~the boundary length — callers tune
the threshold accordingly). It is the optional `use_device_component_filter`
fast path of AnalysisSegmenter.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

_INF = jnp.iinfo(jnp.int32).max


def _segmented_min_scan(values: Array, resets: Array, axis: int) -> Array:
    """Running min along `axis`, restarting wherever resets is True.

    Associative operator over (m, r): combine((m1, r1), (m2, r2)) =
    (m2 if r2 else min(m1, m2), r1 | r2).
    """

    def combine(a, b):
        m1, r1 = a
        m2, r2 = b
        return jnp.where(r2, m2, jnp.minimum(m1, m2)), jnp.logical_or(r1, r2)

    out, _ = lax.associative_scan(combine, (values, resets), axis=axis)
    return out


def _propagate_axis(labels: Array, mask: Array, axis: int) -> Array:
    """Min-label propagation across contiguous mask runs along one axis,
    both directions."""
    resets = jnp.logical_not(mask)
    fwd = _segmented_min_scan(labels, resets, axis)
    bwd = jnp.flip(
        _segmented_min_scan(
            jnp.flip(labels, axis=axis), jnp.flip(resets, axis=axis), axis
        ),
        axis=axis,
    )
    out = jnp.minimum(fwd, bwd)
    return jnp.where(mask, out, _INF)


@partial(jax.jit, static_argnames=("max_iters",))
def connected_components(mask: Array, max_iters: int | None = None) -> Array:
    """4-connected components of a boolean mask.

    Args:
      mask: (B, H, W) or (H, W) bool.
      max_iters: safety cap on sweeps. Each sweep extends the minimum label
        of a not-yet-converged component across at least one more run, and a
        component has at most H*W/2 runs, so the default H*W//2 + 2 is a
        TRUE bound even for maze-shaped 1px components (the loop exits at
        the fixpoint long before this for realistic masks).

    Returns:
      int32 labels, same shape: background = -1, each component labeled by
      the smallest linear index it contains (canonical within an image).
    """
    squeeze = mask.ndim == 2
    if squeeze:
        mask = mask[None]
    b, h, w = mask.shape
    if max_iters is None:
        max_iters = h * w // 2 + 2

    seeds = jnp.arange(h * w, dtype=jnp.int32).reshape(1, h, w)
    labels = jnp.where(mask, seeds, _INF)

    def body(state):
        labels, _, i = state
        new = _propagate_axis(labels, mask, axis=1)  # columns (along H)
        new = _propagate_axis(new, mask, axis=2)  # rows (along W)
        changed = jnp.any(new != labels)
        return new, changed, i + 1

    def cond(state):
        _, changed, i = state
        return jnp.logical_and(changed, i < max_iters)

    labels, _, _ = lax.while_loop(
        cond, body, (labels, jnp.asarray(True), jnp.asarray(0))
    )
    labels = jnp.where(mask, labels, -1)
    return labels[0] if squeeze else labels


@partial(jax.jit, static_argnames=("size",))
def binary_closing(mask: Array, size: int = 5) -> Array:
    """Morphological close (dilate then erode) with a size x size square —
    the host postprocess closes with a 5x5 kernel before finding contours
    (models/base_segmenter.py get_contours_from_prediction)."""
    squeeze = mask.ndim == 2
    if squeeze:
        mask = mask[None]
    pad = size // 2
    window = (1, size, size)
    pads = [(0, 0), (pad, pad), (pad, pad)]
    x = mask.astype(jnp.float32)
    dilated = lax.reduce_window(x, -jnp.inf, lax.max, window, (1, 1, 1), pads)
    closed = lax.reduce_window(
        dilated, jnp.inf, lax.min, window, (1, 1, 1), pads
    )
    out = closed > 0.5
    return out[0] if squeeze else out


@jax.jit
def component_areas(labels: Array) -> Array:
    """Pixel count of each component, addressed by label id: (B, H*W) array
    where areas[b, l] = |component l| (0 elsewhere)."""
    squeeze = labels.ndim == 2
    if squeeze:
        labels = labels[None]
    b, h, w = labels.shape
    flat = labels.reshape(b, h * w)
    valid = flat >= 0
    idx = jnp.where(valid, flat, 0)
    areas = jnp.zeros((b, h * w), jnp.int32)
    areas = jax.vmap(
        lambda a, i, v: a.at[i].add(v.astype(jnp.int32))
    )(areas, idx, valid)
    return areas[0] if squeeze else areas


@partial(jax.jit, static_argnames=("min_area",))
def filter_small_components(mask: Array, min_area: int) -> Array:
    """Zero out components with pixel area < min_area (device-side
    equivalent of the reference's small-contour removal)."""
    if min_area <= 0:
        return mask
    labels = connected_components(mask)
    squeeze = mask.ndim == 2
    if squeeze:
        mask, labels = mask[None], labels[None]
    areas = component_areas(labels)  # (B, H*W)
    b, h, w = mask.shape
    flat = labels.reshape(b, h * w)
    pixel_area = jax.vmap(lambda a, l: a[jnp.where(l >= 0, l, 0)])(areas, flat)
    keep = jnp.logical_and(flat >= 0, pixel_area >= min_area)
    out = keep.reshape(b, h, w)
    return out[0] if squeeze else out
