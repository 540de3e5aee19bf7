"""Multiprocess contour stage == in-process contour stage (bit-exact), and
the spec round-trip that worker processes rely on."""

from pathlib import Path

import numpy as np
import pytest

from synthesis_in_style_tpu.segmentation.dataset_segmenter import (
    BaseClusterBasedDatasetSegmenter,
    BlackWhiteHandwrittenPrintedTextDatasetSegmenter,
)
from synthesis_in_style_tpu.utils.segmentation_utils import resolve_color_map

COARSE = ["8", "9"]
FINE = ["12", "13"]
CLASSES = ["background", "printed_text", "handwritten_text"]


def _skeleton_segmenter(image_size=32):
    """Contour-half-only segmenter built from a spec — no catalogs, no
    label-map artifacts (exactly what pool workers construct)."""
    color_map = resolve_color_map(
        {
            "background": "#000000",
            "printed_text": "#0000FF",
            "handwritten_text": "#FF0000",
        }
    )
    spec = {
        "cls": BlackWhiteHandwrittenPrintedTextDatasetSegmenter,
        "attrs": {
            "base_dir": Path("."),
            "image_size": image_size,
            "class_to_color_map": color_map,
            "class_id_map": {n: i for i, n in enumerate(color_map)},
            "debug": False,
            "debug_images": {},
            "keys_for_class_determination": COARSE,
            "keys_for_finegrained_segmentation": FINE,
            "keys_for_generation": set(COARSE + FINE),
            "keys_to_merge": {},
            "num_clusters": 3,
            "min_class_contour_area": 2,
            "only_keep_overlapping": False,
            "handwriting_overlap_threshold": 0.5,
        },
    }
    return BaseClusterBasedDatasetSegmenter.from_contour_spec(spec)


def _synthetic_predicted(batch=6, size=32, seed=0):
    """Rectangles per class/layer so contours exist and overlap across
    layers (the merge paths all execute)."""
    rng = np.random.default_rng(seed)
    predicted = {}
    for layer in COARSE + FINE:
        per_class = {}
        for ci, cls in enumerate(CLASSES):
            masks = np.zeros((batch, size, size), bool)
            if cls != "background":
                for b in range(batch):
                    x0 = 4 + 2 * ci + rng.integers(0, 3)
                    y0 = 4 + 3 * ci + rng.integers(0, 3)
                    w, h = rng.integers(6, 14, 2)
                    masks[b, y0 : y0 + h, x0 : x0 + w] = True
            per_class[cls] = masks
        predicted[layer] = per_class
    return predicted


def test_contour_spec_roundtrip():
    seg = _skeleton_segmenter()
    spec = seg.contour_spec()
    clone = BaseClusterBasedDatasetSegmenter.from_contour_spec(spec)
    assert type(clone) is BlackWhiteHandwrittenPrintedTextDatasetSegmenter
    assert clone.image_size == seg.image_size
    assert clone.class_id_map == seg.class_id_map


def test_pool_matches_in_process():
    from synthesis_in_style_tpu.segmentation.contour_pool import (
        ContourWorkerPool,
    )

    seg = _skeleton_segmenter()
    predicted = _synthetic_predicted()
    expected_images, expected_drops = seg.segment_prepared(predicted, 6)

    with ContourWorkerPool(seg, num_workers=2, shard_size=2) as pool:
        got_images, got_drops = pool.segment_prepared(predicted, 6)

    assert got_images.shape == expected_images.shape
    np.testing.assert_array_equal(got_images, expected_images)
    assert sorted(got_drops) == sorted(expected_drops)


def test_pool_remaps_shard_drop_ids():
    """An image whose contour spans >95% of both dims is dropped; the pool
    must report its BATCH index even when it lands in a later shard."""
    from synthesis_in_style_tpu.segmentation.contour_pool import (
        ContourWorkerPool,
    )

    seg = _skeleton_segmenter()
    predicted = _synthetic_predicted()
    # make image 5 (second shard with shard_size=2... third shard) all-text
    for layer in COARSE + FINE:
        predicted[layer]["printed_text"][5] = True

    expected_images, expected_drops = seg.segment_prepared(predicted, 6)
    assert 5 in expected_drops

    with ContourWorkerPool(seg, num_workers=2, shard_size=2) as pool:
        _, got_drops = pool.segment_prepared(predicted, 6)
    assert sorted(got_drops) == sorted(expected_drops)


def test_device_segment_matches_host_path():
    """Rasterized on-device back half == host contour path on rectangle
    fixtures (away from the documented divergence edges: pixel-vs-polygon
    area near the threshold and 3px-gap adjacency)."""
    from synthesis_in_style_tpu.segmentation.device_segmenter import (
        run_device_segment,
    )

    seg = _skeleton_segmenter()
    for seed in range(4):
        predicted = _synthetic_predicted(batch=4, seed=seed)
        expected_images, expected_drops = seg.segment_prepared(
            {k: {c: v.copy() for c, v in d.items()} for k, d in predicted.items()},
            4,
        )
        got_images, got_drops = run_device_segment(seg, predicted, 4)
        assert got_images.shape == expected_images.shape
        mismatch = (got_images != expected_images).any(axis=-1).mean()
        assert mismatch == 0.0, f"seed {seed}: {mismatch:.4%} pixels differ"
        assert sorted(got_drops) == sorted(expected_drops), seed


def test_device_segment_drop_rule_matches_host():
    from synthesis_in_style_tpu.segmentation.device_segmenter import (
        run_device_segment,
    )

    seg = _skeleton_segmenter()
    predicted = _synthetic_predicted(batch=4, seed=0)
    for layer in COARSE + FINE:
        predicted[layer]["printed_text"][2] = True
    _, expected_drops = seg.segment_prepared(
        {k: {c: v.copy() for c, v in d.items()} for k, d in predicted.items()},
        4,
    )
    assert 2 in expected_drops
    _, got_drops = run_device_segment(seg, predicted, 4)
    assert sorted(got_drops) == sorted(expected_drops)


def test_device_segment_speckle_divergence_envelope():
    """Pathological 1px-speckle masks hit the documented divergence edges
    (pixel-vs-polygon area at the threshold, 3px-gap adjacency). Pin the
    envelope: <= 3% of pixels, and the drop decisions never differ."""
    from synthesis_in_style_tpu.segmentation.device_segmenter import (
        run_device_segment,
    )

    seg = _skeleton_segmenter()
    rng = np.random.default_rng(42)
    total_mm = total_px = 0
    for _ in range(4):
        predicted = {}
        for layer in COARSE + FINE:
            per_class = {}
            for cls in CLASSES:
                per_class[cls] = (
                    np.zeros((4, 32, 32), bool)
                    if cls == "background"
                    else rng.random((4, 32, 32)) < 0.04
                )
            predicted[layer] = per_class
        exp_img, exp_drop = seg.segment_prepared(
            {k: {c: v.copy() for c, v in d.items()} for k, d in predicted.items()},
            4,
        )
        got_img, got_drop = run_device_segment(seg, predicted, 4)
        total_mm += (got_img != exp_img).any(axis=-1).sum()
        total_px += got_img[..., 0].size
        assert sorted(got_drop) == sorted(exp_drop)
    assert total_mm / total_px <= 0.03, total_mm / total_px
