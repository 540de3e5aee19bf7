"""Rasterized on-device back half of cluster-based label synthesis.

The reference's contour pipeline (base_cluster_based_dataset_segmenter.py:
148-450) extracts polygons with OpenCV, fixpoint-merges overlapping ones,
classifies fine-grained text contours by overlap with coarse regions, and
paints the result — irregular host CPU work that caps the synthesis loop.
This module reproduces the observable behavior (which regions merge, which
images drop, the final color masks) with a fully rasterized formulation
that runs inside ONE jitted program on the TPU:

  polygon                       rasterized equivalent
  --------------------------    -------------------------------------------
  dilate + findContours         dilate_cross + connected_components(8)
  drawContours(..., FILLED)     fill_holes (external-contour fill semantics)
  fixpoint pairwise merge       connected components of the filled union
  "absorbed >= 2 originals"     per-union-component count of source-layer
                                component roots (segment sums)
  contour/region overlap        per-component segment sums of region masks
  bounding-rect drop rule       per-component bbox extents
  render (contour ∧ cluster)    per-pixel class lookup via component labels

Behavioral divergences from the host path, both documented and bounded:
* Area filter compares PIXEL counts, while cv2.contourArea measures the
  polygon (smaller by ~ boundary/2). Thresholds tuned for one path fire
  slightly differently near the cutoff.
* Two regions whose DILATED masks are adjacent-but-disjoint (sources
  exactly 3px apart) merge here (pixel adjacency) but not in the host path
  (AND of rasters is empty).
The host path (contours.py) stays the default and serves as the
bit-compat oracle; tests assert equality away from those edges.

Reference behavior preserved: black_white_handwritten_printed_text_
segmenter.py:42-99 with only_keep_overlapping / drop-empty policies of
base_cluster_based_dataset_segmenter.py:224-294.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from synthesis_in_style_tpu.segmentation.device_cc import (
    component_bboxes,
    component_sums,
    connected_components,
    dilate_cross,
    fill_holes,
)

Array = jax.Array


def _merge_layers(
    layer_masks: Array,  # (L, B, H, W) bool — one class, all source layers
    only_keep_overlapping: bool,
) -> Tuple[Array, Array, Array]:
    """Cross-layer contour merge, rasterized (reference merge_contours via
    merge_contours_of_same_class_from_different_images, :208-294).

    Returns (labels (B, H, W) int32 of merged filled components,
             originals_per_component (B, H*W) float32,
             image_valid (B,) bool — False where any layer is empty, the
             drop_if_size_of_contours_zero policy)."""
    l, b, h, w = layer_masks.shape
    flat_lb = layer_masks.reshape(l * b, h, w)
    dilated = dilate_cross(flat_lb)
    filled = fill_holes(dilated)
    layer_cc = connected_components(filled, connectivity=8)

    union = jnp.any(filled.reshape(l, b, h, w), axis=0)
    union_filled = fill_holes(union)
    union_cc = connected_components(union_filled, connectivity=8)

    # one "root" pixel per source-layer component (its canonical label
    # position); counting roots per union component == counting how many
    # original contours the merged region absorbed
    seeds = jnp.arange(h * w, dtype=jnp.int32).reshape(1, h, w)
    roots = (layer_cc == seeds).reshape(l, b, h, w)
    if l > 1:
        # count per layer: any(roots) would collapse same-pixel roots from
        # different layers and undercount "originals"
        originals = sum(
            component_sums(union_cc, roots[i]) for i in range(l)
        )
    else:
        originals = component_sums(union_cc, roots[0])
    if only_keep_overlapping:
        originals = jnp.where(originals >= 2, originals, 0.0)

    image_valid = jnp.all(
        jnp.any(layer_masks, axis=(2, 3)), axis=0
    )  # (B,) all layers non-empty
    return union_cc, originals, image_valid


@partial(
    jax.jit,
    static_argnames=("only_keep_overlapping", "min_area", "max_extent"),
)
def device_segment(
    coarse: Array,  # (Lc, K, B, H, W) bool — text classes in class-id order
    fine_printed: Array,  # (Lf, B, H, W) bool — fine layers, printed class
    raw_fine_printed: Array,  # (B, H, W) bool — undilated last fine layer
    *,
    only_keep_overlapping: bool,
    min_area: int,
    max_extent: int,
) -> Tuple[Array, Array]:
    """Full rasterized back half. Returns ((B, H, W) uint8 palette
    indices — 0 = background, text class ci -> ci + 1; the caller applies
    the 3-byte color palette host-side so only 1 byte/px crosses the
    device->host link — and (B,) bool drop flags)."""
    lc, k, b, h, w = coarse.shape

    # ---- coarse text regions per class (extract_text_regions, :42-58) ----
    def coarse_one(layer_masks):
        labels, originals, valid = _merge_layers(
            layer_masks, only_keep_overlapping
        )
        areas = component_sums(labels, jnp.ones((b, h, w), bool))
        keep = jnp.logical_and(originals > 0, areas >= min_area)  # (B, H*W)
        flat = labels.reshape(b, h * w)
        kept = jax.vmap(lambda kp, lb: kp[jnp.where(lb >= 0, lb, 0)])(
            keep, flat
        )
        region = jnp.logical_and(flat >= 0, kept).reshape(b, h, w)
        return jnp.logical_and(region, valid[:, None, None])

    coarse_regions = jax.vmap(coarse_one, in_axes=1)(coarse)  # (K, B, H, W)

    # ---- fine-grained printed components (merge_finegrained, :325-340) ----
    fine_cc, fine_originals, fine_valid = _merge_layers(
        fine_printed, only_keep_overlapping=True
    )
    fine_flat = fine_cc.reshape(b, h * w)
    fine_idx = jnp.where(fine_flat >= 0, fine_flat, 0)

    # ---- classification (classify_fine_grained_contours, :342-392) ----
    # overlap of each fine component with each class's coarse region union
    overlaps = jnp.stack(
        [component_sums(fine_cc, coarse_regions[i]) for i in range(k)],
        axis=-1,
    )  # (B, H*W, K)
    best_class = jnp.argmax(overlaps, axis=-1)  # ties -> lowest class id
    best_overlap = jnp.max(overlaps, axis=-1)
    assigned = best_overlap > 0  # (B, H*W) per component id

    # kept fine components: merged (originals>0), valid image, assigned,
    # and (drop_too_small on classified contours) pixel area >= min_area
    fine_areas = component_sums(fine_cc, jnp.ones((b, h, w), bool))
    component_kept = (
        (fine_originals > 0)
        & assigned
        & (fine_areas >= min_area)
        & fine_valid[:, None]
    )  # (B, H*W)

    # ---- image drop rule (determine_images_to_drop, :60-73) ----
    boxes = component_bboxes(fine_cc)  # (B, H*W, 4)
    heights = boxes[..., 2] - boxes[..., 0] + 1
    widths = boxes[..., 3] - boxes[..., 1] + 1
    drop = jnp.zeros((b,), bool)
    for ci in range(k):
        of_class = component_kept & (best_class == ci)
        tall = jnp.any(of_class & (heights > max_extent), axis=1)
        wide = jnp.any(of_class & (widths > max_extent), axis=1)
        drop = drop | (tall & wide)

    # ---- render (render_segmentation_image, :408-450) ----
    pixel_kept = jax.vmap(lambda kp, i: kp[i])(component_kept, fine_idx)
    pixel_class = jax.vmap(lambda c, i: c[i])(best_class, fine_idx)
    fine_fg = fine_flat >= 0
    paint = (
        fine_fg & pixel_kept & raw_fine_printed.reshape(b, h * w)
    )  # (B, H*W)
    # color index: 0 = background, text class ci -> ci + 1
    color_idx = jnp.where(paint, pixel_class + 1, 0).astype(jnp.uint8)
    return color_idx.reshape(b, h, w), drop


def run_device_segment(
    segmenter,
    predicted_clusters,
    batch_size: int,
) -> Tuple[np.ndarray, list]:
    """Adapter: BlackWhite segmenter + PredictedClusters dict (device or
    host arrays) -> device_segment call, returning the host-path interface
    ((B', H, W, 3) uint8, drop id list)."""
    class_names = [
        n for n in segmenter.class_to_color_map if n != "background"
    ]
    coarse = jnp.stack(
        [
            jnp.stack(
                [
                    jnp.asarray(predicted_clusters[layer][cls])
                    for cls in class_names
                ]
            )
            for layer in segmenter.keys_for_class_determination
        ]
    )  # (Lc, K, B, H, W)
    fine_layers = segmenter.keys_for_finegrained_segmentation
    fine_printed = jnp.stack(
        [
            jnp.asarray(predicted_clusters[layer]["printed_text"])
            for layer in fine_layers
        ]
    )
    raw_fine = jnp.asarray(
        predicted_clusters[fine_layers[-1]]["printed_text"]
    )
    palette = np.stack(
        [np.asarray(segmenter.class_to_color_map["background"])]
        + [
            np.asarray(segmenter.class_to_color_map[c])
            for c in class_names
        ]
    ).astype(np.uint8)
    idx, drop = device_segment(
        coarse,
        fine_printed,
        raw_fine,
        only_keep_overlapping=bool(segmenter.only_keep_overlapping),
        min_area=int(segmenter.min_class_contour_area),
        max_extent=int(segmenter.image_size * 0.95),
    )
    drop_ids = [int(i) for i in np.flatnonzero(np.asarray(drop))]
    return palette[np.asarray(idx)], drop_ids
