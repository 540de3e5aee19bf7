"""DatasetGAN-style segmenter: classify per-pixel generator features with a
pixel-classifier ensemble.

Capability parity with the reference
(/root/reference/stylegan_code_finder/segmentation/dataset_gan_segmenter.py:12-63),
re-designed for TPU: activation upscaling + feature concat + vmapped
ensemble vote + colorization run as one jitted program; the ensemble loads
from either an orbax snapshot (stacked params) or a reference torch .pt
(network_<i> keys, converted and stacked)."""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from synthesis_in_style_tpu.models.pixel_classifier import PixelEnsembleClassifier
from synthesis_in_style_tpu.segmentation.dataset_segmenter import BaseDatasetSegmenter

Array = jax.Array


def scale_activations(
    activations: Dict[int, Array],
    image_size: int,
    method: str = "bilinear",
) -> Array:
    """Upsample every layer's activations to image size and concat features:
    {layer: (B, h, w, C_l)} -> (B, S, S, sum C_l)  (reference
    data/dataset_gan_dataset.py scale_activations :12-34; the reference's 14
    hardcoded per-layer Upsample modules reduce to resize-to-image-size).
    NHWC, on device."""
    parts = []
    for key in sorted(activations.keys()):
        act = activations[key]
        if act.shape[1] != image_size:
            act = jax.image.resize(
                act,
                (act.shape[0], image_size, image_size, act.shape[-1]),
                method=method,
            )
        parts.append(act)
    return jnp.concatenate(parts, axis=-1)


def load_ensemble(
    path: Union[str, Path], num_classes: int
) -> PixelEnsembleClassifier:
    """Reference load_ensemble (dataset_gan_segmenter.py:22-32): collect all
    `network_*` entries of the checkpoint into one ensemble."""
    path = Path(path)
    if path.is_dir():
        from synthesis_in_style_tpu.utils.checkpoint import load_pytree

        tree = load_pytree(path)
        variables = tree.get("pixel_ensemble")
        if variables is None:  # individual network_<i> keys
            members = [
                tree[k] for k in sorted(tree) if k.startswith("network_")
            ]
            variables = jax.tree_util.tree_map(
                lambda *leaves: np.stack(leaves), *members
            )
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
        return PixelEnsembleClassifier.from_stacked_variables(
            variables, num_classes
        )
    # reference torch checkpoint
    from synthesis_in_style_tpu.utils.checkpoint import load_torch_checkpoint

    ckpt = load_torch_checkpoint(path)
    members = []
    for key in sorted(ckpt):
        if "network" in key and "optimizer" not in key:
            members.append(_torch_pixel_classifier_to_flax(ckpt[key]))
    stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack([jnp.asarray(l) for l in leaves]), *members
    )
    return PixelEnsembleClassifier.from_stacked_variables(stacked, num_classes)


def _torch_pixel_classifier_to_flax(sd: Dict[str, np.ndarray]) -> Dict:
    """torch Sequential layout (layers.0 linear, layers.2 bn, layers.3
    linear, layers.5 bn, layers.6 linear — reference model.py:63-85) ->
    flax {params, batch_stats}."""
    def lin(i):
        return {
            "kernel": np.asarray(sd[f"layers.{i}.weight"]).T,
            "bias": np.asarray(sd[f"layers.{i}.bias"]),
        }

    def bn(i):
        return (
            {
                "scale": np.asarray(sd[f"layers.{i}.weight"]),
                "bias": np.asarray(sd[f"layers.{i}.bias"]),
            },
            {
                "mean": np.asarray(sd[f"layers.{i}.running_mean"]),
                "var": np.asarray(sd[f"layers.{i}.running_var"]),
            },
        )

    bn1_p, bn1_s = bn(2)
    bn2_p, bn2_s = bn(5)
    return {
        "params": {
            "fc1": lin(0), "bn1": bn1_p, "fc2": lin(3), "bn2": bn2_p,
            "fc3": lin(6),
        },
        "batch_stats": {"bn1": bn1_s, "bn2": bn2_s},
    }


class DatasetGANSegmenter(BaseDatasetSegmenter):
    """Reference DatasetGANSegmenter (dataset_gan_segmenter.py:12-63)."""

    def __init__(
        self,
        *args,
        classifier_path: Union[str, Path],
        feature_size: Optional[int] = None,
        upsample_mode: str = "bilinear",
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.upsample_mode = upsample_mode
        self.ensemble = load_ensemble(
            classifier_path, len(self.class_to_color_map)
        )
        self.feature_size = feature_size or self.ensemble.dim
        self._predict = jax.jit(self._predict_label_images)

    def _predict_label_images(self, scaled: Array) -> Array:
        b, h, w, f = scaled.shape
        flat = scaled.reshape(b * h * w, f)
        labels = self.ensemble.predict_classes(flat)
        return labels.reshape(b, h, w)

    def predict_labels(self, scaled_activations: Array) -> Array:
        """(B, S, S, F) -> (B, S, S) labels (reference :35-42)."""
        return self._predict(scaled_activations)

    def label_images_to_color_images(self, label_images) -> np.ndarray:
        """(B, H, W) -> (B, H, W, 3) uint8 (reference :44-53): the
        background class id keeps the background color regardless of its
        position in class_to_color_map; every other class paints its own."""
        labels = np.asarray(label_images)
        lut = np.zeros((len(self.class_to_color_map), 3), np.uint8)
        for class_id, (name, color) in enumerate(self.class_to_color_map.items()):
            lut[class_id] = color
        return lut[labels]

    def create_segmentation_image(
        self, activations: Dict[int, Array]
    ) -> Tuple[np.ndarray, List[int]]:
        scaled = scale_activations(activations, self.image_size, self.upsample_mode)
        label_images = self.predict_labels(scaled)
        return self.label_images_to_color_images(label_images), []
