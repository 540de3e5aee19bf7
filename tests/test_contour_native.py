"""Native C++ contour engine (native/contour_engine.cpp) vs the pure
Python/cv2 path in segmentation/contours.py.

The native engine links the SYSTEM OpenCV (4.x) while the Python path uses
the pip cv2 (5.x) — these tests pin bit-identical outputs across both
implementations AND both OpenCV versions, for every routed primitive and
for the full host segmentation stage. Skipped when no compiler/OpenCV dev
install is available (the pure path is the tested fallback then).
"""

import numpy as np
import pytest

from synthesis_in_style_tpu.native.contour_engine import get_contour_engine

lib = get_contour_engine()
pytestmark = pytest.mark.skipif(
    lib is None, reason="native contour engine unavailable (no g++/OpenCV dev)"
)


def _rand_masks(rng, n, size=96, boxes=6):
    m = np.zeros((n, size, size), np.uint8)
    for b in range(n):
        for _ in range(boxes):
            x0, y0 = rng.integers(0, size - 20, 2)
            w, h = rng.integers(4, 40, 2)
            m[b, y0 : y0 + h, x0 : x0 + w] = 1
    return m


def _find(mask):
    import cv2

    cs, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    return list(cs)


def test_dilate_find_parity():
    from synthesis_in_style_tpu.native.contour_engine import (
        dilate_find_contours_native,
    )
    from synthesis_in_style_tpu.segmentation import contours as C

    masks = _rand_masks(np.random.default_rng(0), 8)
    got = dilate_find_contours_native(lib, masks)
    old = C._NATIVE_DISABLED
    C._NATIVE_DISABLED = True
    try:
        ref = C.cluster_image_to_contours(masks)
    finally:
        C._NATIVE_DISABLED = old
    assert len(ref) == len(got)
    for rc, gc in zip(ref, got):
        assert len(rc) == len(gc)
        for a, b in zip(rc, gc):
            np.testing.assert_array_equal(a.reshape(-1, 2), b.reshape(-1, 2))


@pytest.mark.parametrize("only_keep_overlapping", [False, True])
def test_merge_parity(only_keep_overlapping):
    from synthesis_in_style_tpu.native.contour_engine import (
        merge_contours_native,
    )
    from synthesis_in_style_tpu.segmentation import contours as C

    rng = np.random.default_rng(1)
    for trial in range(15):
        cs = _find(_rand_masks(rng, 1, boxes=5)[0])
        got = merge_contours_native(lib, cs, only_keep_overlapping)
        old = C._NATIVE_DISABLED
        C._NATIVE_DISABLED = True
        try:
            ref = C.merge_contours(cs, only_keep_overlapping)
        finally:
            C._NATIVE_DISABLED = old
        assert len(ref) == len(got), trial
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(a.reshape(-1, 2), b.reshape(-1, 2))


def test_overlap_counts_parity():
    from synthesis_in_style_tpu.native.contour_engine import (
        overlap_counts_native,
    )
    from synthesis_in_style_tpu.segmentation.contours import contour_overlap

    rng = np.random.default_rng(2)
    a = _find(_rand_masks(rng, 1, boxes=7)[0])
    b = _find(_rand_masks(rng, 1, boxes=7)[0])
    mat = overlap_counts_native(lib, a, b)
    for i, ca in enumerate(a):
        for j, cb in enumerate(b):
            assert mat[i, j] == contour_overlap(ca, cb)


def test_empty_and_degenerate_inputs():
    from synthesis_in_style_tpu.native.contour_engine import (
        merge_contours_native,
        overlap_counts_native,
    )

    assert merge_contours_native(lib, []) == []
    assert merge_contours_native(lib, [], only_keep_overlapping=True) == []
    # single-point and two-point contours rasterize as dot/line
    dot = np.array([[[5, 5]]], np.int32)
    line = np.array([[[1, 1]], [[8, 1]]], np.int32)
    out = merge_contours_native(lib, [dot, line])
    assert len(out) == 2  # disjoint: nothing merges
    # a 1-pixel bbox never STRICTLY overlaps (reference
    # BBox.is_overlapping_with strict-inequality semantics) — parity with
    # the Python path, which also returns 0 here
    from synthesis_in_style_tpu.segmentation.contours import contour_overlap

    mat = overlap_counts_native(lib, [dot], [dot])
    assert mat[0, 0] == contour_overlap(dot, dot) == 0
    sq = np.array([[[3, 3]], [[9, 3]], [[9, 9]], [[3, 9]]], np.int32)
    mat = overlap_counts_native(lib, [sq], [sq])
    assert mat[0, 0] == contour_overlap(sq, sq) == 49


def test_multithreaded_batch_calls_deterministic(monkeypatch):
    """The threaded batch entry points (dilate/find, render-by-image) must
    produce identical output regardless of thread count — per-slot writes
    plus ordered packing, no racy accumulation."""
    import synthesis_in_style_tpu.native.contour_engine as eng

    masks = _rand_masks(np.random.default_rng(5), 12, size=64, boxes=5)
    monkeypatch.setenv("SIS_CONTOUR_THREADS", "1")
    one = eng.dilate_find_contours_native(lib, masks)
    monkeypatch.setenv("SIS_CONTOUR_THREADS", "4")
    four = eng.dilate_find_contours_native(lib, masks)
    assert len(one) == len(four)
    for a_set, b_set in zip(one, four):
        assert len(a_set) == len(b_set)
        for a, b in zip(a_set, b_set):
            np.testing.assert_array_equal(a, b)

    contours = [c for s in one for c in s]
    image_ids = np.asarray(
        [m for m, s in enumerate(one) for _ in s], np.int32
    )
    color_ids = np.ones(len(contours), np.int32)
    fine = masks
    colors = np.asarray([[0, 0, 0], [255, 0, 0]], np.uint8)
    monkeypatch.setenv("SIS_CONTOUR_THREADS", "1")
    r1 = eng.render_native(lib, contours, image_ids, color_ids, fine, colors)
    monkeypatch.setenv("SIS_CONTOUR_THREADS", "4")
    r4 = eng.render_native(lib, contours, image_ids, color_ids, fine, colors)
    np.testing.assert_array_equal(r1, r4)


def test_full_stage_identical():
    """segment_prepared output is byte-identical native vs pure."""
    from pathlib import Path

    from synthesis_in_style_tpu.scripts.contour_scaling import (
        synthetic_predicted,
    )
    from synthesis_in_style_tpu.segmentation import contours as C
    from synthesis_in_style_tpu.segmentation.dataset_segmenter import (
        BaseClusterBasedDatasetSegmenter,
        BlackWhiteHandwrittenPrintedTextDatasetSegmenter,
    )
    from synthesis_in_style_tpu.utils.segmentation_utils import (
        resolve_color_map,
    )

    coarse, fine = ["8", "9"], ["12", "13"]
    classes = ["background", "printed_text", "handwritten_text"]
    color_map = resolve_color_map(
        {
            "background": "#000000",
            "printed_text": "#0000FF",
            "handwritten_text": "#FF0000",
        }
    )
    seg = BaseClusterBasedDatasetSegmenter.from_contour_spec(
        {
            "cls": BlackWhiteHandwrittenPrintedTextDatasetSegmenter,
            "attrs": {
                "base_dir": Path("."),
                "image_size": 128,
                "class_to_color_map": color_map,
                "class_id_map": {n: i for i, n in enumerate(color_map)},
                "debug": False,
                "debug_images": {},
                "keys_for_class_determination": coarse,
                "keys_for_finegrained_segmentation": fine,
                "keys_for_generation": set(coarse + fine),
                "keys_to_merge": {},
                "num_clusters": 3,
                "min_class_contour_area": 10,
                "only_keep_overlapping": False,
                "handwriting_overlap_threshold": 0.5,
            },
        }
    )
    fx = synthetic_predicted(6, 128, 3, coarse, fine, classes)
    img_n, drop_n = seg.segment_prepared(fx, 6)
    old = C._NATIVE_DISABLED
    C._NATIVE_DISABLED = True
    try:
        img_p, drop_p = seg.segment_prepared(fx, 6)
    finally:
        C._NATIVE_DISABLED = old
    np.testing.assert_array_equal(img_n, img_p)
    assert drop_n == drop_p


def test_abi_version_guard():
    """A cached .so reporting a different ABI version must be refused by
    _bind (AttributeError -> load_native returns None -> pure fallback),
    never bound with shifted arguments."""
    from synthesis_in_style_tpu.native import contour_engine as ce

    lib = get_contour_engine()
    if lib is None:
        pytest.skip("native engine unavailable")
    assert lib.sis_abi_version() == ce._ABI_VERSION

    class _FakeVersion:
        restype = None
        argtypes = None

        def __call__(self):
            return ce._ABI_VERSION + 1

    class _FakeLib:
        sis_abi_version = _FakeVersion()

    with pytest.raises(AttributeError, match="ABI"):
        ce._bind(_FakeLib())


def test_n_threads_malformed_env(monkeypatch):
    from synthesis_in_style_tpu.native.contour_engine import _n_threads

    monkeypatch.setenv("SIS_CONTOUR_THREADS", "auto")
    assert _n_threads() >= 1
    monkeypatch.setenv("SIS_CONTOUR_THREADS", "3")
    assert _n_threads() == 3
