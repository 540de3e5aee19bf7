"""Multiprocess execution of the host contour stage.

The contour/classify back half of labelled-dataset synthesis (reference
base_cluster_based_dataset_segmenter.py:148-450) is per-image independent
CPU work — on a production TPU host it parallelizes across cores while the
device runs the next batch's synthesis + cluster front half. This module
farms `segment_prepared` shards to a process pool whose workers rebuild a
contour-half-only segmenter from a picklable spec (no catalogs, no jax
device state — see BaseClusterBasedDatasetSegmenter.contour_spec).

Processes, not threads: the merge fixpoint is pure-Python/numpy and GIL-
bound, so the reference-equivalent thread pool cannot scale it.
`mp_context="spawn"` — the parent holds live XLA/relay threads, which make
fork unsafe.
"""

from __future__ import annotations

import multiprocessing as mp
import os
from concurrent.futures import ProcessPoolExecutor
from typing import Dict, List, Tuple

import numpy as np

_WORKER_SEGMENTER = None


def _init_worker(spec: Dict) -> None:
    global _WORKER_SEGMENTER
    # Parallelism here comes from processes: without this, every worker's
    # native contour calls would default to cpu_count() threads each
    # (num_workers * cores total — thread thrash, not scaling). An explicit
    # SIS_CONTOUR_THREADS in the parent is inherited and respected.
    os.environ.setdefault("SIS_CONTOUR_THREADS", "1")
    from synthesis_in_style_tpu.segmentation.dataset_segmenter import (
        BaseClusterBasedDatasetSegmenter,
    )

    _WORKER_SEGMENTER = BaseClusterBasedDatasetSegmenter.from_contour_spec(
        spec
    )


def _run_shard(payload: Tuple[Dict, int]) -> Tuple[np.ndarray, List[int]]:
    predicted_slice, shard_size = payload
    return _WORKER_SEGMENTER.segment_prepared(predicted_slice, shard_size)


class ContourWorkerPool:
    """Runs segmenter.segment_prepared sharded over worker processes.

    Drop-in for the in-process call: `pool.segment_prepared(predicted, B)`
    returns the same ((B, H, W, 3) color masks for the FULL batch, drop ids)
    contract as segmenter.segment_prepared — dropped images are NOT removed
    here; the caller applies `np.delete(..., drop_ids)` (shard-local drop
    ids are remapped to batch indices).
    """

    def __init__(self, segmenter, num_workers: int, shard_size: int = 2):
        self.shard_size = max(1, shard_size)
        self._executor = ProcessPoolExecutor(
            max_workers=num_workers,
            mp_context=mp.get_context("spawn"),
            initializer=_init_worker,
            initargs=(segmenter.contour_spec(),),
        )

    def segment_prepared(
        self, predicted: Dict[str, Dict[str, np.ndarray]], batch_size: int
    ) -> Tuple[np.ndarray, List[int]]:
        shards = []
        for start in range(0, batch_size, self.shard_size):
            end = min(start + self.shard_size, batch_size)
            predicted_slice = {
                layer: {
                    cls: np.asarray(arr[start:end])
                    for cls, arr in classes.items()
                }
                for layer, classes in predicted.items()
            }
            shards.append(
                (
                    start,
                    self._executor.submit(
                        _run_shard, (predicted_slice, end - start)
                    ),
                )
            )
        images = []
        drop_ids: List[int] = []
        for start, future in shards:
            shard_images, shard_drops = future.result()
            images.append(shard_images)
            drop_ids.extend(start + d for d in shard_drops)
        return np.concatenate(images, axis=0), drop_ids

    def shutdown(self) -> None:
        self._executor.shutdown(wait=False, cancel_futures=True)

    def __enter__(self) -> "ContourWorkerPool":
        return self

    def __exit__(self, *exc) -> None:
        self.shutdown()
