"""JSON-manifest image dataset.

Replaces the external `pytorch_training.data.json_dataset.JSONDataset` +
`caching_loader.CachingLoader` + `default_loader` used throughout the
reference (SURVEY.md §2.5 "external trainer lib"; call sites
utils/data_loading.py:35-77, train_stylegan_2.py:33-50).

A manifest is a JSON list of file paths, or a list of dicts with a
'file_name' key (reference SegmentationDataset.load_json_data,
data/segmentation_dataset.py:31-33).
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path
from typing import Callable, List, Optional, Union

import numpy as np
from PIL import Image

IMAGE_EXTENSIONS = {".png", ".jpg", ".jpeg", ".bmp", ".gif", ".tiff", ".webp"}


def is_image(path: Union[str, Path]) -> bool:
    return Path(path).suffix.lower() in IMAGE_EXTENSIONS


def default_loader(path: Union[str, Path]) -> Image.Image:
    image = Image.open(path)
    return image.convert("RGB") if image.mode != "RGB" else image


def resilient_loader(path: Union[str, Path]) -> Image.Image:
    """Swallow corrupt images, returning a blank 256x256 canvas (reference
    utils/data_loading.py:27-32)."""
    try:
        return default_loader(path)
    except Exception as e:  # noqa: BLE001 — parity: any load failure
        print(f"Could not load {path} with exception: {e}")
        return Image.new("RGB", (256, 256))


class CachingLoader:
    """Copy-once local cache in front of a base loader (reference
    pytorch_training CachingLoader as used at train_stylegan_2.py:34-38)."""

    def __init__(
        self,
        source_root: Union[str, Path],
        cache_root: Union[str, Path],
        base_loader: Callable = resilient_loader,
    ):
        self.source_root = Path(source_root)
        self.cache_root = Path(cache_root)
        self.base_loader = base_loader

    def __call__(self, path: Union[str, Path]) -> Image.Image:
        path = Path(path)
        try:
            rel = path.relative_to(self.source_root)
        except ValueError:
            return self.base_loader(path)
        cached = self.cache_root / rel
        if not cached.exists():
            cached.parent.mkdir(parents=True, exist_ok=True)
            try:
                shutil.copyfile(path, cached)
            except OSError:
                return self.base_loader(path)
        return self.base_loader(cached)


class JSONDataset:
    """Index-addressable image dataset over a JSON manifest."""

    def __init__(
        self,
        json_path: Union[str, Path],
        root: Optional[Union[str, Path]] = None,
        transforms: Optional[Callable] = None,
        loader: Callable = resilient_loader,
    ):
        self.json_path = Path(json_path)
        self.root = str(root) if root is not None else None
        self.transforms = transforms
        self.loader = loader
        with self.json_path.open() as f:
            self.load_json_data(json.load(f))

    def load_json_data(self, json_data) -> None:
        paths: List[str] = []
        for entry in json_data:
            path = entry["file_name"] if isinstance(entry, dict) else entry
            if is_image(path):
                paths.append(path)
        self.image_data = paths

    def full_path(self, index: int) -> str:
        path = self.image_data[index]
        if self.root is not None:
            path = os.path.join(self.root, path)
        return path

    def __len__(self) -> int:
        return len(self.image_data)

    def __getitem__(self, index: int):
        image = self.loader(self.full_path(index))
        if self.transforms is not None:
            return self.transforms(image)
        return image


def normalize_to_tensor(image: Image.Image, image_size: Optional[int] = None,
                        num_channels: int = 3) -> np.ndarray:
    """Resize → [0,1] → mean/std 0.5 normalization to [-1, 1], HWC float32
    (reference transform stack, utils/data_loading.py:38-42)."""
    if image_size is not None and image.size != (image_size, image_size):
        image = image.resize((image_size, image_size), Image.BILINEAR)
    arr = np.asarray(image, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[:, :, None]
    arr = arr[:, :, :num_channels]
    return (arr - 0.5) / 0.5
