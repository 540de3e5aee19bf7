"""Contour machinery for cluster-based label synthesis — host-side numpy/cv2.

Behavioral parity with the reference contour pipeline
(/root/reference/stylegan_code_finder/segmentation/base_cluster_based_dataset_segmenter.py:148-450
and utils/segmentation_utils.py:67-85), re-designed for throughput:

* The reference's `merge_contours` fixpoint merges ONE overlapping pair per
  scan and restarts the O(n^2) search (:208-222). Here each round builds the
  full pairwise-overlap graph (bbox prefilter first), union-finds the
  connected groups, and merges every group at once by rasterizing the union
  and taking its external contours; rounds repeat until no pair overlaps.
  The fixpoint is raster-identical (the reference's own tests canonicalize
  results by comparing rasterized masks, tests/test_merge_contours.py:51-70)
  but needs O(rounds) instead of O(merges) scans.
* Contours are plain OpenCV point arrays; every function is pure (the
  reference interleaves these with segmenter state).

Data shapes follow the reference conventions:
  ClassContours       = {class_name: [contours_or_None per image]}
  ClassContoursForSubImages = {sub_image_key: {class_name: [contours per image]}}
"""

from __future__ import annotations

import os
from collections import defaultdict
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Sequence, Tuple, Union

import cv2
import numpy as np

# Host-side contour work parallelizes across images: OpenCV releases the GIL,
# so a shared thread pool gives near-linear scaling on multi-core hosts (the
# reference ran everything on one thread).
_POOL = ThreadPoolExecutor(max_workers=max(2, os.cpu_count() or 2))

# The native C++ engine (native/contour_engine.cpp) implements the hot
# primitives — batched dilate+findContours, the merge fixpoint, pairwise
# overlap counts — with the same OpenCV calls, bit-identical outputs
# (tests/test_contour_native.py), and no per-pair Python overhead. ctypes
# calls release the GIL, so the thread pool above scales across cores
# without the multiprocess pool's pickling tax. Pure fallback everywhere.
_NATIVE_DISABLED = bool(os.environ.get("SIS_DISABLE_NATIVE_CONTOURS"))


def _native():
    if _NATIVE_DISABLED:
        return None
    from synthesis_in_style_tpu.native.contour_engine import get_contour_engine

    return get_contour_engine()


def _parallel_map(fn, items):
    items = list(items)
    if len(items) <= 1:
        return [fn(item) for item in items]
    return list(_POOL.map(fn, items))

Contour = np.ndarray
ClassContours = Dict[str, List[Optional[List[Contour]]]]
ClassContoursForSubImages = Dict[str, Dict[str, List[List[Contour]]]]


def dilate_image(
    image: np.ndarray, kernel: Optional[np.ndarray] = None, kernel_size: int = 3
) -> np.ndarray:
    """Cross-kernel morphological dilation (reference
    base_dataset_segmenter.py:52-57)."""
    if kernel is None:
        kernel = cv2.getStructuringElement(
            cv2.MORPH_CROSS, (kernel_size, kernel_size)
        ).astype(np.uint8)
    return cv2.morphologyEx(image, cv2.MORPH_DILATE, kernel)


def cluster_image_to_contours(cluster_arrays: np.ndarray) -> List[List[Contour]]:
    """Dilate each (H, W) mask then take external contours (reference
    base_cluster_based_dataset_segmenter.py:148-154); images in parallel."""
    lib = _native()
    if lib is not None and getattr(cluster_arrays, "ndim", 0) == 3:
        from synthesis_in_style_tpu.native.contour_engine import (
            dilate_find_contours_native,
        )

        return dilate_find_contours_native(
            lib, np.ascontiguousarray(cluster_arrays, dtype=np.uint8)
        )

    def one(image):
        dilated = dilate_image(np.ascontiguousarray(image, dtype=np.uint8))
        contours, _ = cv2.findContours(
            dilated, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
        )
        return list(contours)

    return _parallel_map(one, cluster_arrays)


def _contour_bounds(contour: Contour) -> Tuple[int, int, int, int]:
    """(x_min, y_min, x_max, y_max) inclusive."""
    pts = contour.reshape(-1, 2)
    x_min, y_min = pts.min(axis=0)
    x_max, y_max = pts.max(axis=0)
    return int(x_min), int(y_min), int(x_max), int(y_max)


def _bboxes_overlap(a, b) -> bool:
    """Strict comparisons, matching reference BBox.is_overlapping_with
    (utils/segmentation_utils.py:52-56): boxes that merely touch at their
    extreme row/column do NOT overlap, so such contour pairs are never
    merged — behavioral parity over geometric intuition."""
    return a[0] < b[2] and a[2] > b[0] and a[1] < b[3] and a[3] > b[1]


def _rasterize(contours: Sequence[Contour], bounds=None) -> List[np.ndarray]:
    """Draw each contour filled on a shared-size canvas (reference
    draw_contours_on_same_sized_canvases, utils/segmentation_utils.py:74-85)."""
    if bounds is None:
        all_pts = np.concatenate([c.reshape(-1, 2) for c in contours])
        x_min, y_min = all_pts.min(axis=0)
        x_max, y_max = all_pts.max(axis=0)
    else:
        x_min, y_min, x_max, y_max = bounds
    canvas = np.zeros((y_max - y_min + 1, x_max - x_min + 1), np.uint8)
    return [
        cv2.drawContours(canvas.copy(), [c - (x_min, y_min)], 0, 1, cv2.FILLED)
        for c in contours
    ]


def contour_overlap(contour1: Contour, contour2: Contour) -> int:
    """Number of shared filled pixels, 0 if bboxes don't intersect
    (reference contour_overlap, :156-181)."""
    b1, b2 = _contour_bounds(contour1), _contour_bounds(contour2)
    if not _bboxes_overlap(b1, b2):
        return 0
    bounds = (
        min(b1[0], b2[0]),
        min(b1[1], b2[1]),
        max(b1[2], b2[2]),
        max(b1[3], b2[3]),
    )
    img1, img2 = _rasterize([contour1, contour2], bounds)
    return int(np.logical_and(img1, img2).sum())


def merge_two_contours_if_overlapping(
    contour1: Contour, contour2: Contour
) -> Optional[List[Contour]]:
    """Union the rasters and return the external contours of the result, or
    None if the pair doesn't overlap (reference :183-191)."""
    if contour_overlap(contour1, contour2) == 0:
        return None
    return _merge_contour_group([contour1, contour2])


def _merge_contour_group(contours: Sequence[Contour]) -> List[Contour]:
    """External contours of the union raster of a group."""
    all_pts = np.concatenate([c.reshape(-1, 2) for c in contours])
    x_min, y_min = all_pts.min(axis=0)
    x_max, y_max = all_pts.max(axis=0)
    canvas = np.zeros((int(y_max - y_min) + 1, int(x_max - x_min) + 1), np.uint8)
    for c in contours:
        cv2.drawContours(canvas, [c - (int(x_min), int(y_min))], 0, 255, cv2.FILLED)
    merged, _ = cv2.findContours(canvas, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE)
    return [c + (int(x_min), int(y_min)) for c in merged]


class _UnionFind:
    def __init__(self, n: int):
        self.parent = list(range(n))

    def find(self, i: int) -> int:
        while self.parent[i] != i:
            self.parent[i] = self.parent[self.parent[i]]
            i = self.parent[i]
        return i

    def union(self, a: int, b: int):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[rb] = ra


def merge_contours(
    contours: List[Contour], only_keep_overlapping: bool = False
) -> List[Contour]:
    """Fixpoint-merge all transitively-overlapping contours (reference
    merge_contours, :208-222). With only_keep_overlapping, return only
    contours that absorbed at least two originals."""
    lib = _native()
    if lib is not None:
        from synthesis_in_style_tpu.native.contour_engine import (
            merge_contours_native,
        )

        return merge_contours_native(lib, contours, only_keep_overlapping)
    # items: (set of original ids, contour)
    items: List[Tuple[frozenset, Contour]] = [
        (frozenset([i]), c) for i, c in enumerate(contours)
    ]
    changed = True
    while changed and len(items) > 1:
        changed = False
        uf = _UnionFind(len(items))
        bounds = [_contour_bounds(c) for _, c in items]
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                if uf.find(i) == uf.find(j):
                    continue
                if not _bboxes_overlap(bounds[i], bounds[j]):
                    continue
                if contour_overlap(items[i][1], items[j][1]) > 0:
                    uf.union(i, j)
                    changed = True
        if not changed:
            break
        groups: Dict[int, List[int]] = defaultdict(list)
        for i in range(len(items)):
            groups[uf.find(i)].append(i)
        new_items = []
        for members in groups.values():
            if len(members) == 1:
                new_items.append(items[members[0]])
                continue
            ids = frozenset().union(*(items[m][0] for m in members))
            merged = _merge_contour_group([items[m][1] for m in members])
            for c in merged:
                new_items.append((ids, c))
        items = new_items

    if only_keep_overlapping:
        return [c for ids, c in items if len(ids) > 1]
    return [c for _, c in items]


def merge_contours_of_same_class_from_different_images(
    class_contours_for_sub_images: ClassContoursForSubImages,
    batch_size: int,
    only_keep_overlapping: bool = False,
    class_names_to_merge: Tuple[str, ...] = (),
    drop_if_size_of_contours_zero: bool = False,
) -> ClassContours:
    """Cross-sub-image merge (reference :224-294), per class and per image:
    all-empty → None; drop-if-any-empty policy; single-source passthrough;
    otherwise fixpoint merge of the flattened contour list."""
    if len(class_names_to_merge) == 0:
        class_names_to_merge = tuple(
            {
                class_name
                for sub_image_data in class_contours_for_sub_images.values()
                for class_name in sub_image_data.keys()
            }
        )

    class_to_contours: Dict[str, List[List[List[Contour]]]] = defaultdict(list)
    for class_contours in class_contours_for_sub_images.values():
        for class_name, contours in class_contours.items():
            class_to_contours[class_name].append(contours)

    result: ClassContours = defaultdict(list)
    for class_name, contours_for_class in class_to_contours.items():

        def process(batch_id, contours_for_class=contours_for_class,
                    class_name=class_name):
            per_sub_image = [c[batch_id] for c in contours_for_class]
            empties = [len(c) == 0 for c in per_sub_image]
            if all(empties):
                return None
            if (
                drop_if_size_of_contours_zero
                and class_name in class_names_to_merge
                and any(empties)
            ):
                return None
            if any(empties):
                # keep the first non-empty sub image's contours verbatim
                for sub_contours, empty in zip(per_sub_image, empties):
                    if not empty:
                        return sub_contours
            flat = [c for sub in per_sub_image for c in sub]
            if class_name not in class_names_to_merge or len(per_sub_image) == 1:
                return flat
            merged = merge_contours(flat, only_keep_overlapping)
            return merged if merged else None

        result[class_name] = _parallel_map(process, range(batch_size))
    return result


def merge_contours_of_same_class_from_same_image(
    class_contours: ClassContours,
) -> ClassContours:
    """Per-image merge (reference :296-307)."""
    merged_all: ClassContours = {}
    for class_name, batch_contours in class_contours.items():
        merged_batch = []
        for contours in batch_contours:
            merged_batch.append(None if contours is None else merge_contours(contours))
        merged_all[class_name] = merged_batch
    return merged_all


def drop_too_small_contours(
    class_contours: ClassContours, min_area: float
) -> ClassContours:
    """Area filter (reference :394-406); empties become None."""
    adjusted: ClassContours = {}
    for class_name, batch_contours in class_contours.items():
        adjusted_batch = []
        for contours in batch_contours:
            if contours is not None:
                contours = [c for c in contours if cv2.contourArea(c) >= min_area]
                if len(contours) == 0:
                    contours = None
            adjusted_batch.append(contours)
        adjusted[class_name] = adjusted_batch
    return adjusted


def classify_fine_grained_contours(
    text_regions_per_class: ClassContours,
    fine_grained_contours_per_class: ClassContours,
    class_id_map: Dict[str, int],
    fine_grained_class_name: str = "printed_text",
) -> ClassContours:
    """Assign each fine-grained contour to the class whose coarse text
    regions it overlaps most (reference :342-392)."""
    assert len(text_regions_per_class) == len(fine_grained_contours_per_class), (
        "Num classes of text regions and fine grained contours must be equal!"
    )
    fine_batches = fine_grained_contours_per_class[fine_grained_class_name]
    text_regions_per_class = dict(
        sorted(text_regions_per_class.items(), key=lambda x: class_id_map[x[0]])
    )
    batch_size = len(fine_batches)
    ranking: Dict[int, Dict[int, Dict[str, int]]] = {
        i: defaultdict(dict) for i in range(batch_size)
    }
    lib = _native()
    if lib is not None:
        from synthesis_in_style_tpu.native.contour_engine import (
            overlap_counts_packed_native,
            pack_contours,
        )

        # batch-outer so each image's fine contour set is packed ONCE and
        # reused against every class's text regions
        for batch_id, fine_contours in enumerate(fine_batches):
            if fine_contours is None or len(fine_contours) == 0:
                continue
            fine_packed = pack_contours(fine_contours)
            for class_name, text_regions_batch in text_regions_per_class.items():
                text_regions = text_regions_batch[batch_id]
                if text_regions is None:
                    continue
                counts = overlap_counts_packed_native(
                    lib, fine_packed, len(fine_contours), text_regions
                ).sum(axis=1)
                for contour_id, total in enumerate(counts):
                    per_contour = ranking[batch_id][contour_id]
                    per_contour.setdefault(class_name, 0)
                    per_contour[class_name] += int(total)
    else:
        for class_name, text_regions_batch in text_regions_per_class.items():
            for batch_id, (text_regions, fine_contours) in enumerate(
                zip(text_regions_batch, fine_batches)
            ):
                if (
                    text_regions is None
                    or fine_contours is None
                    or len(fine_contours) == 0
                ):
                    continue
                for contour_id, fine_contour in enumerate(fine_contours):
                    per_contour = ranking[batch_id][contour_id]
                    per_contour.setdefault(class_name, 0)
                    for text_region in text_regions:
                        per_contour[class_name] += contour_overlap(
                            fine_contour, text_region
                        )

    classified: ClassContours = {
        class_name: [[] for _ in range(batch_size)]
        for class_name in text_regions_per_class
    }
    for batch_id in range(batch_size):
        for contour_id, class_ranking in ranking[batch_id].items():
            best = max(class_ranking, key=class_ranking.get)
            if class_ranking[best] > 0:
                classified[best][batch_id].append(fine_batches[batch_id][contour_id])
        for class_name in text_regions_per_class:
            if len(classified[class_name][batch_id]) == 0:
                classified[class_name][batch_id] = None
    return classified


def render_segmentation_image(
    fine_grained_prediction: Dict[str, np.ndarray],
    classified_contours: ClassContours,
    batch_size: int,
    image_size: int,
    class_to_color_map: Dict[str, Tuple[int, int, int]],
    cluster_class_name: str = "printed_text",
    class_clip_masks: Optional[Dict[str, np.ndarray]] = None,
) -> np.ndarray:
    """Paint (contour mask AND fine cluster mask) per class onto a
    background-colored canvas (reference :408-450). Returns
    (B, H, W, 3) uint8.

    `class_clip_masks` ({class: (B, H, W) bool}) additionally limits each
    class's paint to its own class-determination region mask (the opt-in
    `clip_to_class_regions` semantics, dataset_segmenter.py)."""
    fine_masks = {
        name: np.asarray(mask) for name, mask in fine_grained_prediction.items()
    }

    lib = _native()
    if class_clip_masks is not None:
        lib = None  # clip masks are painted per class: pure path only
    if lib is not None:
        from synthesis_in_style_tpu.native.contour_engine import render_native

        # Flatten in the pure path's exact paint order — per image:
        # fine-mask class order, then contour list order (later wins).
        color_rows = [np.asarray(class_to_color_map["background"], np.uint8)]
        flat: List[Contour] = []
        image_ids: List[int] = []
        color_ids: List[int] = []
        for class_name in fine_masks:
            if class_name == "background":
                continue
            batch_contours = classified_contours.get(class_name)
            if not batch_contours:
                continue
            color_rows.append(
                np.asarray(class_to_color_map[class_name], np.uint8)
            )
            cid = len(color_rows) - 1
            for batch_id in range(batch_size):
                contours = batch_contours[batch_id]
                if contours is None:
                    continue
                for contour in contours:
                    flat.append(contour)
                    image_ids.append(batch_id)
                    color_ids.append(cid)
        fine = fine_masks[cluster_class_name].astype(np.uint8)
        if fine.shape[0] != batch_size:
            fine = np.broadcast_to(
                fine, (batch_size,) + fine.shape[1:]
            ).copy()
        return render_native(
            lib,
            flat,
            np.asarray(image_ids, np.int32),
            np.asarray(color_ids, np.int32),
            fine,
            np.stack(color_rows),
        )

    def render_one(batch_id: int) -> np.ndarray:
        canvas = np.zeros((image_size, image_size, 3), np.uint8)
        canvas[:, :] = class_to_color_map["background"]
        for class_name in fine_masks:
            if class_name == "background":
                continue
            batch_contours = classified_contours.get(class_name)
            contours = batch_contours[batch_id] if batch_contours else None
            if contours is None:
                continue
            for contour in contours:
                contour_mask = np.zeros((image_size, image_size))
                contour_mask = cv2.drawContours(
                    contour_mask, [contour], 0, 1, cv2.FILLED
                ).astype(bool)
                fine_mask = np.where(
                    contour_mask, fine_masks[cluster_class_name][batch_id], False
                )
                if class_clip_masks is not None:
                    fine_mask &= class_clip_masks[class_name][batch_id]
                canvas[fine_mask] = class_to_color_map[class_name]
        return canvas

    return np.stack(_parallel_map(render_one, range(batch_size)), axis=0)
