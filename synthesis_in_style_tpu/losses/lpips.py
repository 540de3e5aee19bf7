"""LPIPS perceptual distance — TPU-native reimplementation.

Capability parity with the vendored richzhang library used by the reference
(/root/reference/stylegan_code_finder/losses/lpips/networks_basic.py PNetLin
:29-100): scaling layer → backbone features at 5 taps → channel-unit-
normalize → squared diff → learned 1x1 "lin" weights → spatial mean → sum
over taps.

Weights: the learned lin weights are the small public LPIPS v0.1 .pth files
(vendored by the reference, losses/lpips/weights/); convert with
`load_torch_lpips_lin`. The backbone (AlexNet/VGG16) needs torchvision
ImageNet weights which are NOT available in this image — without them the
distance runs with a random backbone (architecture capability intact,
values uncalibrated). Pass converted backbones via `backbone_variables`.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from synthesis_in_style_tpu.losses.feature_extractors import (
    ALEXNET_CHANNELS,
    AlexNetFeatures,
    VGG16Features,
    VGG16_CHANNELS,
    VGG16_LPIPS_TAPS,
    init_extractor,
)

Array = jax.Array

# (reference ScalingLayer, networks_basic.py:96-100)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _normalize_tensor(feat: Array, eps: float = 1e-10) -> Array:
    norm = jnp.sqrt(jnp.sum(jnp.square(feat), axis=-1, keepdims=True))
    return feat / (norm + eps)


def load_torch_lpips_lin(path) -> List[np.ndarray]:
    """Load the learned per-tap lin weights from an LPIPS .pth (keys
    lin<k>.model.1.weight, shape (1, C, 1, 1)) -> list of (C,) arrays."""
    import torch

    sd = torch.load(path, map_location="cpu")
    lins = []
    k = 0
    while f"lin{k}.model.1.weight" in sd:
        lins.append(np.asarray(sd[f"lin{k}.model.1.weight"]).reshape(-1))
        k += 1
    return lins


class LPIPS:
    """Callable LPIPS distance, pure/jittable (reference PNetLin.forward,
    networks_basic.py:66-94)."""

    def __init__(
        self,
        net: str = "alex",
        backbone_variables: Optional[Dict[str, Any]] = None,
        lin_weights: Optional[List[np.ndarray]] = None,
        lin_weights_path=None,
        seed: int = 0,
    ):
        if net in ("vgg", "vgg16"):
            self.backbone = VGG16Features()
            self.taps = list(VGG16_LPIPS_TAPS)
            channels = [VGG16_CHANNELS[t] for t in self.taps]
        elif net == "alex":
            self.backbone = AlexNetFeatures()
            self.taps = list(range(5))
            channels = ALEXNET_CHANNELS
        else:
            raise NotImplementedError(net)
        self.variables = backbone_variables or init_extractor(
            self.backbone, seed=seed
        )
        if lin_weights is None and lin_weights_path is not None:
            lin_weights = load_torch_lpips_lin(lin_weights_path)
        if lin_weights is None:
            # lpips=False mode of the reference: plain summed diffs
            lin_weights = [np.ones(c, np.float32) for c in channels]
        self.lin_weights = [jnp.asarray(w) for w in lin_weights]

    def _features(self, x: Array) -> List[Array]:
        x = (x - _SHIFT) / _SCALE
        feats = self.backbone.apply(self.variables, x)
        return [feats[t] for t in self.taps]

    def __call__(self, pred: Array, target: Array,
                 normalize: bool = False) -> Array:
        """Inputs NHWC; in [-1, 1] (or [0, 1] with normalize=True, reference
        PerceptualLoss.forward, lpips/__init__.py:26-40). Returns (B,)."""
        if normalize:
            pred = 2 * pred - 1
            target = 2 * target - 1
        feats0 = self._features(pred)
        feats1 = self._features(target)
        total = jnp.zeros((pred.shape[0],))
        for f0, f1, lin in zip(feats0, feats1, self.lin_weights):
            diff = jnp.square(_normalize_tensor(f0) - _normalize_tensor(f1))
            weighted = jnp.sum(diff * lin, axis=-1)  # 1x1 conv == channel dot
            total += jnp.mean(weighted, axis=(1, 2))
        return total
