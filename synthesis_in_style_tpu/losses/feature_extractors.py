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


# ---------------------------------------------------------------------------
# SqueezeNet 1.1 (the reference LPIPS's third backbone; richzhang
# pretrained_networks.squeezenet slices features[0:2], [2:5], [5:8], [8:10],
# [10], [11], [12] -> 7 taps of 64/128/256/384/384/512/512 channels — the
# shapes of the vendored losses/lpips_weights v0.x squeeze lin weights)
# ---------------------------------------------------------------------------

SQUEEZENET_CHANNELS = [64, 128, 256, 384, 384, 512, 512]
# (squeeze, expand) per Fire module of squeezenet1_1, in torchvision order
_SQUEEZE_FIRES = [
    (16, 64), (16, 64), (32, 128), (32, 128),
    (48, 192), (48, 192), (64, 256), (64, 256),
]
# torchvision features indices of the Fire modules
_SQUEEZE_FIRE_IDS = [3, 4, 6, 7, 9, 10, 11, 12]
# maxpool before these fire list-positions
_SQUEEZE_POOL_BEFORE = {0, 2, 4}
# tap after this fire list-position (first tap is the stem conv)
_SQUEEZE_TAP_AFTER = {1, 3, 4, 5, 6, 7}


class Fire(nn.Module):
    """SqueezeNet Fire: 1x1 squeeze -> relu -> concat(1x1, 3x3 expands)."""

    squeeze: int
    expand: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        s = nn.relu(nn.Conv(self.squeeze, (1, 1), name="squeeze")(x))
        e1 = nn.relu(nn.Conv(self.expand, (1, 1), name="expand1x1")(s))
        e3 = nn.relu(
            nn.Conv(
                self.expand, (3, 3), padding=[(1, 1), (1, 1)], name="expand3x3"
            )(s)
        )
        return jnp.concatenate([e1, e3], axis=-1)


class SqueezeNetFeatures(nn.Module):
    """squeezenet1_1 trunk; returns the 7 LPIPS tap maps."""

    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        feats = []
        # stem: conv 3x3 stride 2 VALID (torchvision Conv2d(3, 64, 3, 2))
        x = nn.Conv(
            64, (3, 3), strides=(2, 2), padding="VALID", name="conv_0"
        )(x)
        x = nn.relu(x)
        feats.append(x)  # tap 0
        for i, (sq, ex) in enumerate(_SQUEEZE_FIRES):
            if i in _SQUEEZE_POOL_BEFORE:
                # ceil_mode=True maxpool 3x3/s2 (torchvision default here)
                h, w = x.shape[1], x.shape[2]
                ph = 0 if (h - 3) % 2 == 0 else 1
                pw = 0 if (w - 3) % 2 == 0 else 1
                x = nn.max_pool(
                    x, (3, 3), strides=(2, 2),
                    padding=[(0, ph), (0, pw)],
                )
            x = Fire(sq, ex, name=f"fire_{i}")(x)
            if i in _SQUEEZE_TAP_AFTER:
                feats.append(x)
        return feats


def load_torch_squeezenet_features(
    state_dict: Dict[str, np.ndarray]
) -> Dict:
    """torchvision squeezenet1_1 state dict -> flax variables for
    SqueezeNetFeatures."""
    prefix = (
        "features." if any(k.startswith("features.") for k in state_dict)
        else ""
    )

    def conv(tkey):
        return {
            "kernel": np.asarray(
                state_dict[f"{tkey}.weight"]
            ).transpose(2, 3, 1, 0),
            "bias": np.asarray(state_dict[f"{tkey}.bias"]),
        }

    params: Dict[str, Any] = {"conv_0": conv(f"{prefix}0")}
    for i, tid in enumerate(_SQUEEZE_FIRE_IDS):
        params[f"fire_{i}"] = {
            "squeeze": conv(f"{prefix}{tid}.squeeze"),
            "expand1x1": conv(f"{prefix}{tid}.expand1x1"),
            "expand3x3": conv(f"{prefix}{tid}.expand3x3"),
        }
    return {"params": params}
