"""Autoencoder datasets: (augmented input, clean output) pairs.

Capability parity with the reference
(/root/reference/stylegan_code_finder/data/autoencoder_dataset.py:16-66):
identity, gaussian-denoising, and black/white-denoising variants (imgaug
AdditiveGaussianNoise reimplemented in numpy; variance drawn per image from
the reference's DENOISING_VARIANCES list)."""

from __future__ import annotations

import itertools
import threading
from typing import Dict

import numpy as np
from PIL import Image

from synthesis_in_style_tpu.data.json_dataset import (
    JSONDataset,
    normalize_to_tensor,
    resilient_loader,
)

DENOISING_VARIANCES = [5, 10, 15, 25, 35, 50]


class AutoencoderDataset(JSONDataset):
    def __init__(self, *args, image_size: int, num_channels: int = 3,
                 seed: int = 666, **kwargs):
        super().__init__(*args, **kwargs)
        self.image_size = image_size
        self.num_channels = num_channels
        # numpy Generators are not thread-safe and the DataLoader fetches
        # samples on a thread pool — give each worker thread its own stream,
        # seeded from a stable first-use counter (NOT the OS thread id,
        # which differs run-to-run and would break reproducibility; torch
        # seeds workers as base_seed + worker_id the same way)
        self._seed = seed
        self._local = threading.local()
        self._worker_counter = itertools.count()

    @property
    def _rng(self) -> np.random.Generator:
        rng = getattr(self._local, "rng", None)
        if rng is None:
            worker_id = next(self._worker_counter)
            rng = np.random.default_rng((self._seed, worker_id))
            self._local.rng = rng
        return rng

    def augment_image(self, image: Image.Image) -> Image.Image:
        return image

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        image = self.loader(self.full_path(index))
        augmented = self.augment_image(image)
        return {
            "input_image": normalize_to_tensor(
                augmented, self.image_size, self.num_channels
            ),
            "output_image": normalize_to_tensor(
                image, self.image_size, self.num_channels
            ),
        }


class DenoisingAutoencoderDataset(AutoencoderDataset):
    """Additive gaussian noise, optionally per-channel (reference :39-54)."""

    def augment_image(self, image: Image.Image) -> Image.Image:
        arr = np.asarray(image).astype(np.float32)
        scale = float(self._rng.choice(DENOISING_VARIANCES))
        per_channel = bool(self._rng.integers(2))
        if per_channel or arr.ndim == 2:
            noise = self._rng.normal(0, scale, arr.shape)
        else:
            noise = self._rng.normal(0, scale, arr.shape[:2])[..., None]
        return Image.fromarray(
            np.clip(arr + noise, 0, 255).astype(np.uint8)
        )


class BlackAndWhiteDenoisingAutoencoderDataset(DenoisingAutoencoderDataset):
    """Grayscale both sides (reference :57-66)."""

    def __init__(self, *args, loader=resilient_loader, **kwargs):
        base_loader = loader
        super().__init__(
            *args,
            loader=lambda path: base_loader(path).convert("L").convert("RGB"),
            **kwargs,
        )

    def augment_image(self, image: Image.Image) -> Image.Image:
        return super().augment_image(image).convert("L").convert("RGB")
