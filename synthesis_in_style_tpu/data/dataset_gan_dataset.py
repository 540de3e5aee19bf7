"""DatasetGAN activation datasets: per-pixel (feature vector, label) samples
over generator activations.

Capability parity with the reference
(/root/reference/stylegan_code_finder/data/base_dataset_gan_dataset.py:14-120,
data/dataset_gan_dataset.py:37-66, data/dataset_gan_generation_dataset.py:11-56):

* manifest entries {"image", "label", "activations"|"latent"} + a
  `tensors.npz` holding per-image activation dicts and/or latent codes
  (written by cli/create_dataset_for_activation_classification).
* per-pixel `__getitem__` -> {"activations": (F,), "label": ()} with
  class-probability bucket sampling (reference :83-99) or flat indexing.
* `DatasetGANGenerationDataset.reset_dataset()` regenerates the activations
  from the stored latents each epoch with fresh noise (reference
  dataset_gan_generation_dataset.py:24-41) — here one jitted generator call
  per image batch.
* `sample_pixel_batches` is the TPU-first fast path: vectorized batch draws
  straight from the (N, S, S, F) array instead of 10k Python __getitem__
  calls per batch.

The reference's 14 hardcoded per-layer torch Upsample modules
(base_dataset_gan_dataset.py:37-52) reduce to resize-to-image-size
(segmentation.dataset_gan_segmenter.scale_activations).
"""

from __future__ import annotations

import itertools
import json
import threading
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Union

import jax
import numpy as np

from synthesis_in_style_tpu.data.json_dataset import resilient_loader
from synthesis_in_style_tpu.segmentation.dataset_gan_segmenter import (
    scale_activations,
)
from synthesis_in_style_tpu.utils.segmentation_utils import (
    segmentation_image_to_class_image,
)


class BaseDatasetGANDataset:
    def __init__(
        self,
        json_path: Union[str, Path],
        tensor_path: Union[str, Path],
        class_to_color_map_path: Union[str, Path],
        image_size: int,
        upsample_mode: str = "bilinear",
        class_probabilities: Union[float, List[float]] = 0.5,
        random_sampling: bool = False,
        background_class_name: str = "background",
        root: Optional[Union[str, Path]] = None,
        loader=resilient_loader,
        seed: int = 0,
    ):
        self.json_path = Path(json_path)
        with self.json_path.open() as f:
            self.json_data = json.load(f)
        with Path(class_to_color_map_path).open() as f:
            self.class_to_color_map = json.load(f)
        self.background_class_name = background_class_name
        self.image_size = image_size
        self.upsample_mode = upsample_mode
        self.tensor_path = Path(tensor_path)
        self.dataset_path = self.tensor_path.parent
        self.random_sampling = random_sampling
        self.loader = loader
        self.seed = seed
        # thread-local streams: the DataLoader fetches samples on a thread
        # pool and numpy Generators are not thread-safe; seeded from a
        # stable first-use counter so runs reproduce (OS thread ids differ
        # run-to-run)
        self._local = threading.local()
        self._worker_counter = itertools.count()

        if isinstance(class_probabilities, float):
            self.class_probabilities = [class_probabilities, 1 - class_probabilities]
        else:
            self.class_probabilities = list(class_probabilities)

        self.image_paths: List[Path] = []
        self.activations = None
        self.init_vectors = None
        self.sampling_buckets: List[np.ndarray] = []
        self.pixel_activations: Optional[np.ndarray] = None  # (N, S, S, F)
        self.pixel_labels: Optional[np.ndarray] = None  # (N, S, S)
        self.feature_vector_length = -1

    @property
    def _rng(self) -> np.random.Generator:
        rng = getattr(self._local, "rng", None)
        if rng is None:
            worker_id = next(self._worker_counter)
            rng = np.random.default_rng((self.seed, worker_id))
            self._local.rng = rng
        return rng

    # ---------------- loading ----------------

    def load_tensors(self, keys: List[str]) -> None:
        tensors = np.load(self.tensor_path, mmap_mode="r", allow_pickle=True)
        if "activations" in keys:
            self.activations = tensors["activations"]
        if "latent_codes" in keys:
            self.init_vectors = tensors["latent_codes"]

    def _load_label(self, entry: dict) -> np.ndarray:
        label_image = self.loader(str(self.dataset_path / entry["label"]))
        label = segmentation_image_to_class_image(
            np.asarray(label_image.convert("RGB")),
            self.class_to_color_map,
            self.background_class_name,
        )
        if label.shape != (self.image_size, self.image_size):
            from PIL import Image

            label = np.asarray(
                Image.fromarray(label.astype(np.uint8)).resize(
                    (self.image_size, self.image_size), Image.NEAREST
                )
            )
        return label.astype(np.int32)

    def get_feature_vector_length(self) -> int:
        return self.feature_vector_length

    def _effective_probabilities(self, bucket_sizes: List[int]) -> np.ndarray:
        """Renormalize class probabilities over non-empty buckets (a class
        absent from the labels would otherwise make sampling crash)."""
        probs = np.asarray(self.class_probabilities, np.float64)
        probs = np.where(np.asarray(bucket_sizes) > 0, probs, 0.0)
        total = probs.sum()
        assert total > 0, "all sampling buckets are empty"
        return probs / total

    def create_sampling_buckets(self) -> None:
        self.sampling_buckets = [
            np.argwhere(self.pixel_labels == i)
            for i in range(len(self.class_probabilities))
        ]

    # ---------------- item access (reference :83-99) ----------------

    def __len__(self) -> int:
        if self.random_sampling:
            return sum(len(bucket) for bucket in self.sampling_buckets)
        return int(self.pixel_labels.size)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        if self.random_sampling:
            probs = self._effective_probabilities(
                [len(b) for b in self.sampling_buckets]
            )
            indicator = self._rng.choice(len(probs), p=probs)
            bucket = self.sampling_buckets[indicator]
            indices = tuple(bucket[self._rng.integers(len(bucket))])
        else:
            indices = np.unravel_index(index, self.pixel_labels.shape)
        return {
            "activations": np.asarray(
                self.pixel_activations[indices], np.float32
            ),
            "label": np.asarray(self.pixel_labels[indices], np.int32),
        }

    def sample_pixel_batches(
        self, batch_size: int, seed: int = 0
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Vectorized endless batch stream honoring the bucket sampling
        policy (TPU-first fast path)."""
        rng = np.random.default_rng(seed)
        labels_flat = self.pixel_labels.reshape(-1)
        n_batches_per_epoch = max(1, len(self) // batch_size)
        buckets = None
        probs = None
        if self.random_sampling:
            buckets = [
                np.flatnonzero(labels_flat == i)
                for i in range(len(self.class_probabilities))
            ]
            probs = self._effective_probabilities([len(b) for b in buckets])
        self.epoch = 0.0
        batches = 0
        while True:
            if self.random_sampling:
                indicator = rng.choice(
                    len(probs), size=batch_size, p=probs
                )
                idx = np.array(
                    [buckets[i][rng.integers(len(buckets[i]))] for i in indicator]
                )
            else:
                idx = rng.integers(0, labels_flat.size, batch_size)
            # re-read pixel_activations EVERY batch: reset_dataset() rebinds
            # it each epoch for generation-backed datasets, and a captured
            # flattened view would silently serve stale activations
            acts_flat = self.pixel_activations.reshape(
                -1, self.feature_vector_length
            )
            yield {
                "activations": acts_flat[idx],
                "label": labels_flat[idx],
            }
            batches += 1
            self.epoch = batches / n_batches_per_epoch

    def get_images_for_plot(self, num_desired_images: int = 16):
        """(input images, pixel activations, label maps) for the plotter
        (reference :102-116)."""
        n = min(num_desired_images, len(self.image_paths))
        images = [
            np.asarray(self.loader(str(self.image_paths[i]))) for i in range(n)
        ]
        activations = [self.pixel_activations[i] for i in range(n)]
        labels = [self.pixel_labels[i] for i in range(n)]
        return images, activations, labels


class DatasetGANDataset(BaseDatasetGANDataset):
    """Precomputed-activation variant (reference dataset_gan_dataset.py:37-66)."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.load_tensors(["activations"])
        self.load_data()
        if self.random_sampling:
            self.create_sampling_buckets()

    def load_data(self) -> None:
        assert self.activations is not None, "Activations were not loaded properly"
        scaled = []
        labels = []
        for entry in self.json_data:
            self.image_paths.append(self.dataset_path / entry["image"])
            labels.append(self._load_label(entry))
            act_dict = self.activations[entry["activations"]]
            act_dict = {int(k): np.asarray(v)[None] for k, v in act_dict.items()}
            scaled.append(
                np.asarray(
                    scale_activations(act_dict, self.image_size, self.upsample_mode)
                )[0]
            )
        self.activations = None
        self.pixel_activations = np.stack(scaled).astype(np.float32)
        self.pixel_labels = np.stack(labels)
        self.feature_vector_length = self.pixel_activations.shape[-1]


class DatasetGANGenerationDataset(BaseDatasetGANDataset):
    """Regenerating variant (reference dataset_gan_generation_dataset.py:11-56):
    activations are re-synthesized from stored latents with fresh noise on
    every `reset_dataset()` call."""

    def __init__(self, *args, generator_fn=None, **kwargs):
        """generator_fn(latents (B, D), seed) -> {layer: (B, h, w, C)}."""
        super().__init__(*args, **kwargs)
        assert generator_fn is not None
        self.generator_fn = generator_fn
        self.load_tensors(["latent_codes"])
        self.load_data()
        self.reset_dataset()
        if self.random_sampling:
            self.create_sampling_buckets()
        self.feature_vector_length = self.pixel_activations.shape[-1]

    def load_data(self) -> None:
        assert self.init_vectors is not None, (
            "Latent codes/init vectors were not loaded properly"
        )
        self.latents = []
        labels = []
        for entry in self.json_data:
            self.latents.append(np.asarray(self.init_vectors[entry["latent"]]))
            self.image_paths.append(self.dataset_path / entry["image"])
            labels.append(self._load_label(entry))
        self.pixel_labels = np.stack(labels)
        self.latents = np.stack(self.latents)

    def reset_dataset(self) -> None:
        seed = int(self._rng.integers(2**31))
        activations = self.generator_fn(self.latents, seed)
        scaled = scale_activations(activations, self.image_size, self.upsample_mode)
        self.pixel_activations = np.asarray(scaled, np.float32)


def build_dataset_gan_dataset(json_path: Path, config: dict, args):
    """Dispatch helper used by cli/train.py (reference
    utils/data_loading.py:79-120, :137-155)."""
    common = dict(
        json_path=json_path,
        tensor_path=config["tensor_path"],
        class_to_color_map_path=Path(args.class_to_color_map),
        image_size=config["image_size"],
        upsample_mode=config.get("upsample_mode", "bilinear"),
        class_probabilities=config.get("class_probability", 0.5),
        random_sampling=config.get("random_sampling", False),
    )
    if config.get("generate"):
        from synthesis_in_style_tpu.core.config import load_config_from_checkpoint
        from synthesis_in_style_tpu.models.factory import load_generator

        gen_config = load_config_from_checkpoint(
            config["checkpoint"],
            getattr(args, "original_generator_config_path", None),
        )
        gen, variables = load_generator(config["checkpoint"], gen_config)

        @jax.jit
        def gen_acts(z, key):
            _, activations = gen.apply(
                variables,
                [z],
                randomize_noise=True,
                rngs={"noise": key},
                return_intermediate_activations=True,
            )
            return activations

        def generator_fn(latents, seed):
            import jax.numpy as jnp

            # fresh noise each reset (reference make_noise per epoch,
            # dataset_gan_generation_dataset.py:25-27)
            return gen_acts(jnp.asarray(latents), jax.random.PRNGKey(seed))

        return DatasetGANGenerationDataset(generator_fn=generator_fn, **common)
    return DatasetGANDataset(**common)
