"""Pretrained-style CNN feature extractors: VGG16 and AlexNet in flax, NHWC.

These back the perceptual/style losses (reference
losses/perceptual_style_loss.py uses torchvision VGG16) and LPIPS (reference
losses/lpips/pretrained_networks.py wraps torchvision vgg16/alexnet).
torchvision is not available in this image and there is no network egress,
so pretrained weights must be supplied as torch state dicts via the
`load_torch_*` converters (layouts documented below); without weights the
extractors run with random init — architecture capability is intact, metric
values are not ImageNet-calibrated.

Conversion: torch conv (out, in, kh, kw) -> flax (kh, kw, in, out); the
torchvision `features` Sequential indices are mapped by name below.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array

# torchvision vgg16.features conv indices -> our layer names
VGG16_CONV_IDS = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
VGG16_CHANNELS = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
# max-pool after these conv positions (0-indexed into the conv list)
VGG16_POOL_AFTER = {1, 3, 6, 9, 12}

# LPIPS taps: relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
VGG16_LPIPS_TAPS = (1, 3, 6, 9, 12)
# perceptual/style taps (reference perceptual_style_loss.py blocks
# conv1_1, conv1_2, conv2_2, conv3_3)
VGG16_STYLE_TAPS = {"conv1_1": 0, "conv1_2": 1, "conv2_2": 3, "conv3_3": 6}

ALEXNET_CHANNELS = [64, 192, 384, 256, 256]
ALEXNET_SPECS: List[Tuple[int, int, int, int]] = [
    # (features, kernel, stride, padding)
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
ALEXNET_POOL_AFTER = {0, 1}
ALEXNET_TORCH_CONV_IDS = [0, 3, 6, 8, 10]


class VGG16Features(nn.Module):
    """VGG16 conv trunk; `__call__` returns the post-ReLU feature maps of
    every conv layer (callers pick their taps).

    `max_conv` stops the trunk after that conv index — the perceptual/style
    losses only read through conv3_3 (index 6), so cutting the conv4_x/5_x
    stages (most of VGG16's FLOPs) halves their backbone cost. Extra
    pretrained params for the dropped layers are ignored by flax."""

    max_conv: int = len(VGG16_CHANNELS) - 1

    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        feats = []
        for i, features in enumerate(VGG16_CHANNELS[: self.max_conv + 1]):
            x = nn.Conv(
                features, (3, 3), padding=[(1, 1), (1, 1)], name=f"conv_{i}"
            )(x)
            x = nn.relu(x)
            feats.append(x)
            if i in VGG16_POOL_AFTER:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


class AlexNetFeatures(nn.Module):
    """AlexNet conv trunk; returns post-ReLU maps of all five convs
    (the LPIPS taps)."""

    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        feats = []
        for i, (features, kernel, stride, pad) in enumerate(ALEXNET_SPECS):
            x = nn.Conv(
                features, (kernel, kernel), strides=(stride, stride),
                padding=[(pad, pad), (pad, pad)], name=f"conv_{i}",
            )(x)
            x = nn.relu(x)
            feats.append(x)
            if i in ALEXNET_POOL_AFTER:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return feats


def init_extractor(module: nn.Module, in_channels: int = 3, seed: int = 0):
    x = jnp.zeros((1, 64, 64, in_channels))
    return module.init({"params": jax.random.PRNGKey(seed)}, x)


def _convert_convs(
    state_dict: Dict[str, np.ndarray], torch_ids: Sequence[int], prefix: str
) -> Dict[str, Any]:
    params = {}
    for i, tid in enumerate(torch_ids):
        w = np.asarray(state_dict[f"{prefix}{tid}.weight"])
        params[f"conv_{i}"] = {
            "kernel": w.transpose(2, 3, 1, 0),
            "bias": np.asarray(state_dict[f"{prefix}{tid}.bias"]),
        }
    return params


def load_torch_vgg16_features(state_dict: Dict[str, np.ndarray]) -> Dict:
    """torchvision vgg16 state dict (keys features.<i>.weight) -> flax
    variables for VGG16Features."""
    prefix = "features." if any(k.startswith("features.") for k in state_dict) else ""
    return {"params": _convert_convs(state_dict, VGG16_CONV_IDS, prefix)}


def load_torch_alexnet_features(state_dict: Dict[str, np.ndarray]) -> Dict:
    prefix = "features." if any(k.startswith("features.") for k in state_dict) else ""
    return {"params": _convert_convs(state_dict, ALEXNET_TORCH_CONV_IDS, prefix)}


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def imagenet_normalize_from_unit_range(x: Array) -> Array:
    """[-1, 1] NHWC -> torchvision-normalized input."""
    x01 = (x + 1.0) / 2.0
    return (x01 - IMAGENET_MEAN) / IMAGENET_STD
