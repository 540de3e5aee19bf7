"""Side-by-side [image|mask] segmentation datasets.

Capability parity with the reference
(/root/reference/stylegan_code_finder/data/segmentation_dataset.py:16-107):
each sample is one PNG holding the input image on the left half and the
color-coded segmentation mask on the right half; the mask is converted to
class ids via the class→color map.

TPU-native differences:
  * returns numpy dicts {"images": (H, W, C) float32 in [-1, 1],
    "segmented": (H, W) int32} — NHWC, batched by `data.DataLoader`.
  * `AugmentedSegmentationDataset` inflates the dataset by
    `num_augmentations`; index < len(original) returns the original image,
    later passes return independently-augmented copies (reference :66-107),
    with a per-index-derived RNG stream so epochs are reproducible.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Union

import numpy as np
from PIL import Image

from synthesis_in_style_tpu.data.json_dataset import (
    JSONDataset,
    normalize_to_tensor,
    resilient_loader,
)
from synthesis_in_style_tpu.utils.augmentation import PairedAugmenter
from synthesis_in_style_tpu.utils.segmentation_utils import (
    segmentation_image_to_class_image,
)


class SegmentationDataset(JSONDataset):
    def __init__(
        self,
        json_path: Union[str, Path],
        class_to_color_map_path: Union[str, Path],
        root: Optional[Union[str, Path]] = None,
        image_size: Optional[int] = None,
        background_class_name: str = "background",
        loader=resilient_loader,
        num_input_channels: int = 3,
    ):
        super().__init__(json_path, root=root, loader=loader)
        self.background_class_name = background_class_name
        self.image_size = image_size
        self.num_input_channels = num_input_channels
        with Path(class_to_color_map_path).open() as f:
            self.class_to_color_map = json.load(f)
        assert self.background_class_name in self.class_to_color_map, (
            f"Background class name: {self.background_class_name} not found "
            f"in class to color map"
        )

    @property
    def num_classes(self) -> int:
        return len(self.class_to_color_map)

    def split_image(self, image: Image.Image):
        input_image = image.crop((0, 0, image.width // 2, image.height))
        mask_image = image.crop((image.width // 2, 0, image.width, image.height))
        return input_image, mask_image

    def to_sample(
        self, input_image: Image.Image, mask_image: Image.Image
    ) -> Dict[str, np.ndarray]:
        images = normalize_to_tensor(
            input_image, self.image_size, self.num_input_channels
        )
        class_image = segmentation_image_to_class_image(
            np.asarray(mask_image.convert("RGB")),
            self.class_to_color_map,
            self.background_class_name,
        )
        if self.image_size is not None and class_image.shape != (
            self.image_size,
            self.image_size,
        ):
            # nearest-neighbor resize of the class-id image (reference
            # class_image_to_tensor uses F.interpolate default=nearest, :36-42)
            mask_pil = Image.fromarray(class_image.astype(np.uint8))
            class_image = np.asarray(
                mask_pil.resize((self.image_size, self.image_size), Image.NEAREST)
            )
        assert images.shape[:2] == class_image.shape[:2], (
            "Input image and segmentation shape should be the same!"
        )
        return {
            "images": images,
            "segmented": class_image.astype(np.int32),
        }

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        image = self.loader(self.full_path(index))
        return self.to_sample(*self.split_image(image))


class AugmentedSegmentationDataset(SegmentationDataset):
    """Inflates the dataset num_augmentations-fold (reference :66-107)."""

    def __init__(self, *args, num_augmentations: int = 1, seed: int = 0, **kwargs):
        assert isinstance(num_augmentations, int), "num_augmentations must be an Integer"
        super().__init__(*args, **kwargs)
        self.num_augmentations = num_augmentations
        self.seed = seed
        self.augmenter = PairedAugmenter()

    def __len__(self) -> int:
        return self.num_augmentations * super().__len__()

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        original_length = super().__len__()
        actual_index = index % original_length
        image = self.loader(self.full_path(actual_index))
        input_image, mask_image = self.split_image(image)

        if index // original_length != 0:
            rng = np.random.default_rng((self.seed, index))
            aug_img, aug_mask = self.augmenter(
                np.asarray(input_image.convert("RGB")),
                np.asarray(mask_image.convert("RGB")),
                rng,
            )
            input_image = Image.fromarray(aug_img)
            mask_image = Image.fromarray(aug_mask)

        return self.to_sample(input_image, mask_image)
