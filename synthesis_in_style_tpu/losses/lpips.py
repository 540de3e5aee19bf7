"""LPIPS perceptual distance — TPU-native reimplementation.

Capability parity with the vendored richzhang library used by the reference
(/root/reference/stylegan_code_finder/losses/lpips/networks_basic.py PNetLin
:29-100): scaling layer → backbone features at 5 taps → channel-unit-
normalize → squared diff → learned 1x1 "lin" weights → spatial mean → sum
over taps.

Weights: the learned lin calibration weights (the reference vendors them as
losses/lpips/weights/v0.{0,1}/{alex,vgg,squeeze}.pth) are VENDORED in this
repo as framework-neutral npz (losses/lpips_weights/) and load by default —
no torch needed. The backbone (AlexNet/VGG16) additionally needs torchvision
ImageNet weights: convert once with `scripts/fetch_metric_weights.py` and
pass via `backbone_variables` (or set SIS_METRIC_WEIGHTS to the converted
dir). Without them the distance runs with a random backbone (architecture
capability intact, values UNCALIBRATED) and warns loudly.
"""

from __future__ import annotations

import os
import warnings
from pathlib import Path
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


VENDORED_LIN_DIR = Path(__file__).parent / "lpips_weights"


def load_vendored_lpips_lin(
    net: str = "alex", version: str = "0.1"
) -> List[np.ndarray]:
    """The in-repo npz conversion of the reference's shipped lin weights
    (reference losses/lpips/weights/v0.{0,1}/{alex,vgg,squeeze}.pth;
    richzhang/PerceptualSimilarity, BSD). No torch dependency."""
    net = {"vgg16": "vgg"}.get(net, net)
    path = VENDORED_LIN_DIR / f"v{version}" / f"{net}.npz"
    data = np.load(path)
    return [data[f"lin{k}"] for k in range(len(data.files))]


def _backbone_variables_from_env(net: str):
    """Converted ImageNet backbone npz from $SIS_METRIC_WEIGHTS (written by
    scripts/fetch_metric_weights.py), or None."""
    root = os.environ.get("SIS_METRIC_WEIGHTS")
    if not root:
        return None
    name = {"vgg16": "vgg"}.get(net, net)
    path = Path(root) / f"{name}_features.npz"
    if not path.exists():
        return None
    from synthesis_in_style_tpu.utils.checkpoint import unflatten_npz

    return unflatten_npz(np.load(path))


class LPIPS:
    """Callable LPIPS distance, pure/jittable (reference PNetLin.forward,
    networks_basic.py:66-94)."""

    def __init__(
        self,
        net: str = "alex",
        backbone_variables: Optional[Dict[str, Any]] = None,
        lin_weights: Optional[List[np.ndarray]] = None,
        lin_weights_path=None,
        use_lin: bool = True,
        version: str = "0.1",
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
        elif net == "squeeze":
            from synthesis_in_style_tpu.losses.feature_extractors import (
                SQUEEZENET_CHANNELS,
                SqueezeNetFeatures,
            )

            self.backbone = SqueezeNetFeatures()
            self.taps = list(range(7))
            channels = SQUEEZENET_CHANNELS
        else:
            raise NotImplementedError(net)
        if backbone_variables is None:
            backbone_variables = _backbone_variables_from_env(net)
        self.calibrated_backbone = backbone_variables is not None
        if not self.calibrated_backbone:
            warnings.warn(
                f"LPIPS({net!r}): no ImageNet backbone weights — distances "
                "use a RANDOM-INIT backbone and are NOT calibrated LPIPS. "
                "Convert torchvision weights once with "
                "scripts/fetch_metric_weights.py and set SIS_METRIC_WEIGHTS "
                "(or pass backbone_variables).",
                stacklevel=2,
            )
        self.variables = backbone_variables or init_extractor(
            self.backbone, seed=seed
        )
        if lin_weights is None and lin_weights_path is not None:
            lin_weights = load_torch_lpips_lin(lin_weights_path)
        if lin_weights is None and use_lin:
            # the reference's default: shipped lin calibration weights
            # (losses/lpips/__init__.py:14-25 loads weights/v0.1/<net>.pth);
            # ours are vendored as npz, so this needs no external files
            lin_weights = load_vendored_lpips_lin(net, version)
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
