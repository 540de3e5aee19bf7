"""Perceptual + style (Gram) losses over VGG16 features.

Capability parity with the reference losses
(/root/reference/stylegan_code_finder/losses/__init__.py gram_matrix :5-18,
losses/perceptual_loss.py:5-17 masked-MSE PerceptualLoss,
losses/style_loss.py:7-20 Gram StyleLoss,
losses/perceptual_style_loss.py:12-175 VGG16-block compositions), functional
NHWC re-design: one `PerceptualAndStyleLoss` object holds the VGG variables
and exposes pure jittable loss functions; the "Fixed*" variant of the
reference (precomputed targets) is just closing over the target features.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from synthesis_in_style_tpu.losses.feature_extractors import (
    VGG16Features,
    VGG16_STYLE_TAPS,
    init_extractor,
)

Array = jax.Array


def gram_matrix(features: Array, mask: Optional[Array] = None) -> Array:
    """Gram matrix over flattened spatial dims (reference gram_matrix,
    losses/__init__.py:5-18). features NHWC; mask (B, H, W, 1)."""
    b, h, w, c = features.shape
    if mask is not None:
        denom = jnp.sqrt(jnp.sum(jnp.square(mask), axis=(1, 2), keepdims=True))
        features = features * (mask / (denom + 1e-12))
    flat = features.transpose(0, 3, 1, 2).reshape(b * c, h * w)
    return flat @ flat.T


def style_loss(
    features: Array, target_features: Array, mask: Optional[Array] = None
) -> Array:
    """(reference StyleLoss.forward, style_loss.py:14-20)."""
    b, c = features.shape[0], features.shape[-1]
    g = gram_matrix(features, mask)
    g_target = jax.lax.stop_gradient(gram_matrix(target_features, mask))
    return jnp.sum(jnp.square(g - g_target)) / (4.0 * (b * c) ** 2)


def perceptual_loss(
    features: Array, target_features: Array, mask: Optional[Array] = None
) -> Array:
    """Masked MSE (reference PerceptualLoss, perceptual_loss.py:5-17)."""
    target = jax.lax.stop_gradient(target_features)
    if mask is not None:
        features = features * mask
        target = target * jax.lax.stop_gradient(mask)
    return jnp.mean(jnp.square(features - target))


def euclidean_distance(a: Array, b: Array, mask: Optional[Array] = None) -> Array:
    """(reference losses/__init__.py:21-27)."""
    diff = a - b
    if mask is not None:
        diff = diff * mask
    return jnp.sqrt(jnp.sum(jnp.square(diff))) / a.size


def _resize_mask(mask: Array, shape, method: str) -> Array:
    return jax.image.resize(
        mask, (mask.shape[0], shape[1], shape[2], mask.shape[-1]), method=method
    )


class PerceptualAndStyleLoss:
    """VGG16-block perceptual (+ conv3_3 Gram style) loss (reference
    PerceptualAndStyleLoss, perceptual_style_loss.py:95-150).

    `variables` should come from `feature_extractors.load_torch_vgg16_features`
    for calibrated values; defaults to random init (capability only).
    """

    def __init__(
        self,
        variables=None,
        use_perceptual_loss: bool = True,
        use_style_loss: bool = True,
        seed: int = 0,
    ):
        # the deepest tap is conv3_3 (index 6) — truncate the trunk there so
        # the conv4_x/5_x stages (most of VGG16's FLOPs) are never computed
        self.vgg = VGG16Features(max_conv=max(VGG16_STYLE_TAPS.values()))
        self.variables = variables or init_extractor(self.vgg, seed=seed)
        self.perceptual_taps: Dict[str, int] = (
            dict(VGG16_STYLE_TAPS) if use_perceptual_loss else {}
        )
        self.style_taps: Dict[str, int] = (
            {"conv3_3": VGG16_STYLE_TAPS["conv3_3"]} if use_style_loss else {}
        )

    def __call__(
        self,
        image: Array,
        target: Array,
        mask: Optional[Array] = None,
    ) -> Tuple[Array, Array]:
        """-> (style_loss_sum, perceptual_loss_sum); inputs NHWC in the
        generator range. Pure — safe inside jit/grad."""
        image_feats = self.vgg.apply(self.variables, image)
        target_feats = self.vgg.apply(self.variables, target)

        style_total = jnp.zeros(())
        perceptual_total = jnp.zeros(())
        for name, tap in self.perceptual_taps.items():
            m = (
                _resize_mask(mask, image_feats[tap].shape, "bilinear")
                if mask is not None
                else None
            )
            perceptual_total += perceptual_loss(
                image_feats[tap], target_feats[tap], m
            )
        for name, tap in self.style_taps.items():
            m = (
                _resize_mask(mask, image_feats[tap].shape, "bilinear")
                if mask is not None
                else None
            )
            style_total += style_loss(image_feats[tap], target_feats[tap], m)
        return style_total, perceptual_total


class StyleLossNetwork:
    """conv3_3-only Gram loss (reference StyleLossNetwork,
    perceptual_style_loss.py:153-175)."""

    def __init__(self, variables=None, seed: int = 0):
        self._inner = PerceptualAndStyleLoss(
            variables, use_perceptual_loss=False, use_style_loss=True, seed=seed
        )

    def __call__(self, generated_image: Array, style_image: Array) -> Array:
        style_total, _ = self._inner(generated_image, style_image)
        return style_total
