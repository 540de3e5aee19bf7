"""Threaded, sharded, prefetching data loader.

Replaces torch `DataLoader` + `DistributedSampler` as used by the reference
(utils/data_loading.py:35-77, :53-57): per-host sharding for data
parallelism (`shard_id`/`num_shards` default to `jax.process_index()` /
`jax.process_count()`), seeded per-epoch shuffling, drop_last, and a
background thread pool that keeps `prefetch` batches ready — host-side numpy
only, so batches land in `jax.device_put`-ready form without a torch
dependency.

Exposes `.epoch` (float epoch progress used by `(N, 'epoch')` triggers —
reference trainer contract, SURVEY.md §2.5).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np


def default_collate(samples: Sequence[Any]):
    """Stack a list of samples (numpy arrays / dicts / tuples of them)."""
    first = samples[0]
    if isinstance(first, dict):
        return {k: default_collate([s[k] for s in samples]) for k in first}
    if isinstance(first, (tuple, list)):
        return type(first)(default_collate(list(col)) for col in zip(*samples))
    return np.stack([np.asarray(s) for s in samples])


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        num_workers: int = 8,
        seed: int = 0,
        shard_id: Optional[int] = None,
        num_shards: Optional[int] = None,
        collate_fn: Callable = default_collate,
        prefetch: int = 2,
    ):
        if shard_id is None or num_shards is None:
            import jax

            shard_id = jax.process_index()
            num_shards = jax.process_count()
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.collate_fn = collate_fn
        self.prefetch = prefetch
        self._epoch_counter = 0
        self._batches_into_epoch = 0
        self._skip_batches = 0

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            order = np.random.default_rng((self.seed, epoch)).permutation(n)
        else:
            order = np.arange(n)
        # pad with wrapped samples so every shard sees the SAME number of
        # samples — torch DistributedSampler does exactly this so multi-host
        # step counts stay in lock-step (an unequal split would deadlock any
        # per-step cross-host collective on the shard with more batches)
        per_shard = -(-n // self.num_shards)
        total = per_shard * self.num_shards
        if total > n:
            order = np.concatenate([order, order[: total - n]])
        return order[self.shard_id :: self.num_shards]

    def __len__(self) -> int:
        per_shard = -(-len(self.dataset) // self.num_shards)
        if self.drop_last:
            return per_shard // self.batch_size
        return (per_shard + self.batch_size - 1) // self.batch_size

    @property
    def epoch(self) -> float:
        n = max(1, len(self))
        return self._epoch_counter + self._batches_into_epoch / n

    def _batch_index_lists(self, epoch: int) -> List[np.ndarray]:
        idx = self._epoch_indices(epoch)
        batches = []
        for start in range(0, len(idx), self.batch_size):
            chunk = idx[start : start + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                continue
            batches.append(chunk)
        return batches

    def _iter_epoch(self, epoch: int, start: int = 0) -> Iterator[Any]:
        batches = self._batch_index_lists(epoch)[start:]
        with ThreadPoolExecutor(self.num_workers) as pool:
            pending: "queue.Queue" = queue.Queue()
            max_inflight = max(1, self.prefetch)

            def fetch(batch_idx):
                return self.collate_fn([self.dataset[int(i)] for i in batch_idx])

            it = iter(batches)
            inflight = 0
            for batch_idx in it:
                pending.put(pool.submit(fetch, batch_idx))
                inflight += 1
                if inflight >= max_inflight:
                    break
            while inflight:
                fut = pending.get()
                inflight -= 1
                nxt = next(it, None)
                if nxt is not None:
                    pending.put(pool.submit(fetch, nxt))
                    inflight += 1
                yield fut.result()

    def __iter__(self) -> Iterator[Any]:
        """One pass over the (sharded) dataset."""
        start = self._skip_batches
        self._skip_batches = 0
        self._batches_into_epoch = start
        for batch in self._iter_epoch(self._epoch_counter, start):
            yield batch
            self._batches_into_epoch += 1
        self._epoch_counter += 1
        self._batches_into_epoch = 0

    def batches_per_epoch(self) -> int:
        return len(self._batch_index_lists(0))

    def seek(self, iteration: int) -> None:
        """Position the stream as if `iteration` batches had already been
        consumed — preemption resume replays the EXACT per-epoch seeded
        shuffle sequence a straight-through run would have seen (skipped
        batches are never loaded)."""
        per = self.batches_per_epoch()
        self._epoch_counter = iteration // per
        self._skip_batches = iteration % per
        self._batches_into_epoch = self._skip_batches

    def infinite(self) -> Iterator[Any]:
        """Endless stream with per-epoch reshuffling (the trainer's hot-loop
        iterator; epochs tracked for (N, 'epoch') triggers)."""
        while True:
            yield from self


class EpochStream:
    """Infinite batch stream over a DataLoader exposing the loader's
    `.epoch` for (N, 'epoch') triggers; `key` optionally selects one entry
    of each batch dict. The one shared wrapper used by every trainer wiring
    (training_builder/base.py, the GAN and adversarial CLIs)."""

    def __init__(self, loader: "DataLoader", key: Optional[str] = None,
                 iterator: Optional[Iterator[Any]] = None):
        self._loader = loader
        self._iterator = iter(loader.infinite()) if iterator is None else iterator
        self._key = key

    def __iter__(self) -> "EpochStream":
        return self

    def __next__(self):
        batch = next(self._iterator)
        return batch[self._key] if self._key is not None else batch

    @property
    def epoch(self) -> float:
        return self._loader.epoch


def fill_plot_images(
    data_loader, num_desired_images: int = 16
) -> Dict[str, List[np.ndarray]]:
    """Gather sample images for image-plotter extensions (reference
    utils/data_loading.py fill_plot_images :159-177).

    Must NOT disturb the loader's epoch position: the training stream
    shares it, and preemption resume (`seek`) relies on the
    iteration -> batch mapping being a pure function of the iteration."""
    saved = {
        attr: getattr(data_loader, attr)
        for attr in ("_epoch_counter", "_batches_into_epoch", "_skip_batches")
        if hasattr(data_loader, attr)
    }
    try:
        return _fill_plot_images(data_loader, num_desired_images)
    finally:
        for attr, value in saved.items():
            setattr(data_loader, attr, value)


def _fill_plot_images(
    data_loader, num_desired_images: int
) -> Dict[str, List[np.ndarray]]:
    from collections import defaultdict

    image_list: Dict[str, List[np.ndarray]] = defaultdict(list)
    for batch in data_loader:
        for image_key, images in batch.items():
            for image in images:
                if len(image_list[image_key]) < num_desired_images:
                    image_list[image_key].append(np.asarray(image))
        if image_list and all(
            len(v) >= num_desired_images for v in image_list.values()
        ):
            return dict(image_list)
    raise RuntimeError(
        f"Could not gather enough plot images for display size {num_desired_images}."
    )
