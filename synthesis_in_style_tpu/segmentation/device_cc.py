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


@partial(jax.jit, static_argnames=("max_iters", "connectivity", "backend"))
def connected_components(
    mask: Array, max_iters: int | None = None, connectivity: int = 4,
    backend: str | None = None,
) -> Array:
    """Connected components of a boolean mask.

    Args:
      mask: (B, H, W) or (H, W) bool.
      max_iters: safety cap on sweeps. Each sweep extends the minimum label
        of a not-yet-converged component across at least one more run, and a
        component has at most H*W/2 runs, so the default H*W//2 + 2 is a
        TRUE bound even for maze-shaped 1px components (the loop exits at
        the fixpoint long before this for realistic masks).
      connectivity: 4 (run propagation only) or 8 (additionally bridges
        diagonal neighbors with a 3x3 windowed min each sweep — OpenCV
        findContours semantics).
      backend: None (auto) picks the one-pass Pallas VMEM sweep kernel
        (ops/pallas/segmented_cc.py — 1 HBM read + 1 write per call vs the
        XLA path's ~32 passes per sweep) on TPU for tile-aligned shapes;
        "xla" forces the associative-scan path; "pallas" /
        "pallas_interpret" force the kernel (interpret = CPU tests).

    Returns:
      int32 labels, same shape: background = -1, each component labeled by
      the smallest linear index it contains (canonical within an image).
    """
    assert connectivity in (4, 8), connectivity
    squeeze = mask.ndim == 2
    if squeeze:
        mask = mask[None]
    b, h, w = mask.shape
    if max_iters is None:
        max_iters = h * w // 2 + 2

    if backend is None:
        import os

        from synthesis_in_style_tpu.ops.pallas.segmented_cc import (
            supported_shape,
        )

        backend = os.environ.get("SIS_DEVICE_CC_BACKEND")  # A/B override
        if backend is None:
            backend = (
                "pallas"
                if jax.default_backend() != "cpu" and supported_shape(h, w)
                else "xla"
            )

    seeds = jnp.arange(h * w, dtype=jnp.int32).reshape(1, h, w)
    labels = jnp.where(mask, seeds, _INF)

    if backend in ("pallas", "pallas_interpret"):
        from synthesis_in_style_tpu.ops.pallas.segmented_cc import cc_sweeps

        mask_i = mask.astype(jnp.int32)
        sweeps_per_call = 4

        def p_body(state):
            labels, _, i = state
            new, changed = cc_sweeps(
                labels, mask_i, connectivity=connectivity,
                sweeps=sweeps_per_call,
                interpret=backend == "pallas_interpret",
            )
            return new, jnp.any(changed > 0), i + sweeps_per_call

        def p_cond(state):
            _, changed, i = state
            return jnp.logical_and(changed, i < max_iters)

        changed0 = jnp.logical_or(jnp.any(labels != _INF), True)
        labels, _, _ = lax.while_loop(
            p_cond, p_body, (labels, changed0, jnp.asarray(0))
        )
        labels = jnp.where(mask, labels, -1)
        return labels[0] if squeeze else labels

    def body(state):
        labels, _, i = state
        new = labels
        if connectivity == 8:
            # one windowed-min step links diagonal neighbors; the run
            # propagation below then spreads the bridged label along whole
            # runs in the same sweep
            neigh = lax.reduce_window(
                new, _INF, lax.min, (1, 3, 3), (1, 1, 1),
                [(0, 0), (1, 1), (1, 1)],
            )
            new = jnp.where(mask, jnp.minimum(new, neigh), _INF)
        new = _propagate_axis(new, mask, axis=1)  # columns (along H)
        new = _propagate_axis(new, mask, axis=2)  # rows (along W)
        changed = jnp.any(new != labels)
        return new, changed, i + 1

    def cond(state):
        _, changed, i = state
        return jnp.logical_and(changed, i < max_iters)

    # The init `changed` is derived from `labels` (value is always True) so
    # its type matches the loop-carried one under shard_map, where values
    # computed from sharded operands carry a device-varying type that a
    # plain replicated `jnp.asarray(True)` would not.
    changed0 = jnp.logical_or(jnp.any(labels != _INF), True)
    labels, _, _ = lax.while_loop(
        cond, body, (labels, changed0, jnp.asarray(0))
    )
    labels = jnp.where(mask, labels, -1)
    return labels[0] if squeeze else labels


@jax.jit
def dilate_cross(mask: Array) -> Array:
    """3x3 CROSS-kernel binary dilation (the reference dilates every cluster
    mask with cv2.MORPH_CROSS before contour extraction,
    base_dataset_segmenter.py:52-57)."""
    squeeze = mask.ndim == 2
    if squeeze:
        mask = mask[None]
    x = mask.astype(jnp.float32)
    horiz = lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 1, 3), (1, 1, 1),
        [(0, 0), (0, 0), (1, 1)],
    )
    vert = lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 3, 1), (1, 1, 1),
        [(0, 0), (1, 1), (0, 0)],
    )
    out = jnp.maximum(horiz, vert) > 0.5
    return out[0] if squeeze else out


@jax.jit
def fill_holes(mask: Array) -> Array:
    """Fill interior holes: background regions (4-connected — the correct
    dual of 8-connected foreground) that do not touch the image border
    become foreground. Matches the raster of cv2.drawContours(...FILLED) on
    RETR_EXTERNAL contours."""
    squeeze = mask.ndim == 2
    if squeeze:
        mask = mask[None]
    b, h, w = mask.shape
    bg_labels = connected_components(jnp.logical_not(mask), connectivity=4)
    flat = bg_labels.reshape(b, h * w)
    border = jnp.zeros((h, w), bool)
    border = border.at[0, :].set(True).at[-1, :].set(True)
    border = border.at[:, 0].set(True).at[:, -1].set(True)
    border_flat = border.reshape(h * w)

    def mark(labels_flat):
        is_border_bg = jnp.logical_and(labels_flat >= 0, border_flat)
        idx = jnp.where(is_border_bg, labels_flat, 0)
        marked = jnp.zeros((h * w,), bool).at[idx].max(is_border_bg)
        return marked[jnp.where(labels_flat >= 0, labels_flat, 0)]

    touches_border = jax.vmap(mark)(flat).reshape(b, h, w)
    hole = jnp.logical_and(bg_labels >= 0, jnp.logical_not(touches_border))
    out = jnp.logical_or(mask, hole)
    return out[0] if squeeze else out


@jax.jit
def component_sums(labels: Array, values: Array) -> Array:
    """Per-component sum of `values` (same spatial shape), addressed by
    label id: (B, H*W) with sums[b, l] = sum of values over component l."""
    squeeze = labels.ndim == 2
    if squeeze:
        labels, values = labels[None], values[None]
    b, h, w = labels.shape
    flat = labels.reshape(b, h * w)
    vals = values.reshape(b, h * w).astype(jnp.float32)
    valid = flat >= 0
    idx = jnp.where(valid, flat, 0)
    sums = jax.vmap(
        lambda i, v, m: jnp.zeros((h * w,), jnp.float32).at[i].add(
            jnp.where(m, v, 0.0)
        )
    )(idx, vals, valid)
    return sums[0] if squeeze else sums


@jax.jit
def component_bboxes(labels: Array) -> Array:
    """Per-component inclusive bbox: (B, H*W, 4) of (y_min, x_min, y_max,
    x_max), addressed by label id; unused slots hold (H, W, -1, -1)."""
    squeeze = labels.ndim == 2
    if squeeze:
        labels = labels[None]
    b, h, w = labels.shape
    ys = jnp.broadcast_to(jnp.arange(h)[None, :, None], (b, h, w)).reshape(b, -1)
    xs = jnp.broadcast_to(jnp.arange(w)[None, None, :], (b, h, w)).reshape(b, -1)
    flat = labels.reshape(b, h * w)
    valid = flat >= 0
    idx = jnp.where(valid, flat, 0)

    def one(i, y, x, m):
        y_min = jnp.full((h * w,), h, jnp.int32).at[i].min(jnp.where(m, y, h))
        x_min = jnp.full((h * w,), w, jnp.int32).at[i].min(jnp.where(m, x, w))
        y_max = jnp.full((h * w,), -1, jnp.int32).at[i].max(jnp.where(m, y, -1))
        x_max = jnp.full((h * w,), -1, jnp.int32).at[i].max(jnp.where(m, x, -1))
        return jnp.stack([y_min, x_min, y_max, x_max], axis=-1)

    boxes = jax.vmap(one)(idx, ys, xs, valid)
    return boxes[0] if squeeze else boxes


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


def filter_small_components(mask: Array, min_area) -> Array:
    """Zero out components with pixel area < min_area (device-side
    equivalent of the reference's small-contour removal). `min_area` may be
    a traced scalar so hyperparameter sweeps don't recompile; a concrete
    min_area <= 0 short-circuits (and a traced min_area <= 0 degenerates to
    the identity inside the labelling path: every foreground pixel's area
    is >= 0, so keep == mask)."""
    if isinstance(min_area, (int, float)) and min_area <= 0:
        return mask
    return _filter_small_components(mask, min_area)


@jax.jit
def _filter_small_components(mask: Array, min_area) -> Array:
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
