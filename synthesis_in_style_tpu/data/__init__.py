from synthesis_in_style_tpu.data.json_dataset import (
    JSONDataset,
    is_image,
    resilient_loader,
)
from synthesis_in_style_tpu.data.segmentation_dataset import (
    AugmentedSegmentationDataset,
    SegmentationDataset,
)
from synthesis_in_style_tpu.data.loader import DataLoader

__all__ = [
    "JSONDataset",
    "is_image",
    "resilient_loader",
    "SegmentationDataset",
    "AugmentedSegmentationDataset",
    "DataLoader",
]
