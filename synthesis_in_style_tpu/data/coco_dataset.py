"""COCO ground-truth dataset over side-by-side pair PNGs.

Capability parity with the reference
(/root/reference/stylegan_code_finder/data/coco_dataset.py:10-46): items
carry the (left-half) input image, its image id, and the variable-length
annotation list; `collate_func` keeps annotations as a python list while
stacking the arrays."""

from __future__ import annotations

import json
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Optional, Union

import numpy as np

from synthesis_in_style_tpu.data.json_dataset import (
    normalize_to_tensor,
    resilient_loader,
)
from synthesis_in_style_tpu.data.loader import default_collate


class COCODataset:
    def __init__(
        self,
        json_path: Union[str, Path],
        root: Optional[Union[str, Path]] = None,
        image_size: Optional[int] = None,
        num_channels: int = 3,
        loader=resilient_loader,
    ):
        self.root = Path(root) if root is not None else None
        self.loader = loader
        self.image_size = image_size
        self.num_channels = num_channels
        with Path(json_path).open() as f:
            data = json.load(f)
        self.images = data["images"]
        self.annotations: Dict[int, List[dict]] = defaultdict(list)
        for annotation in data["annotations"]:
            self.annotations[annotation["image_id"]].append(annotation)
        self.categories = data["categories"]

    def __len__(self) -> int:
        return len(self.images)

    @staticmethod
    def collate_func(batch: List[dict]) -> dict:
        """Keep variable-length annotations as a list (reference :23-28)."""
        annotations = [d.pop("annotations") for d in batch]
        collated = default_collate(batch)
        collated["annotations"] = annotations
        return collated

    def __getitem__(self, index: int) -> dict:
        image_info = self.images[index]
        path = image_info["file_name"]
        if self.root is not None:
            path = self.root / path
        image = self.loader(path)
        image_data = image.crop((0, 0, image.width // 2, image.height))
        return {
            "images": normalize_to_tensor(
                image_data, self.image_size, self.num_channels
            ),
            "annotations": self.annotations[image_info["id"]],
            "image_id": np.asarray(image_info["id"], np.int64),
        }
