"""PSNR / SSIM evaluation — pure JAX (reference evaluation/psnr_ssim.py:8-39
used kornia, which is not in this image; the metrics are reimplemented with
the standard gaussian-window SSIM)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def clamp_and_unnormalize(image: Array) -> Array:
    """[-1, 1] -> [0, 1] (pytorch_training.images.utils parity)."""
    return jnp.clip((image + 1.0) / 2.0, 0.0, 1.0)


def _maybe_unnormalize(image: Array) -> Array:
    return jax.lax.cond(
        jnp.min(image) < 0, clamp_and_unnormalize, lambda x: x, image
    )


def psnr(image: Array, target: Array, max_value: float = 1.0) -> Array:
    """Peak signal-to-noise ratio in dB."""
    image = _maybe_unnormalize(image)
    target = _maybe_unnormalize(target)
    mse = jnp.mean(jnp.square(image - target))
    return 10.0 * jnp.log10(max_value**2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int, sigma: float) -> jnp.ndarray:
    coords = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-jnp.square(coords) / (2 * sigma**2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(
    image: Array,
    target: Array,
    kernel_size: int = 5,
    sigma: float = 1.5,
    max_value: float = 1.0,
) -> Array:
    """Mean structural similarity (gaussian window, kornia/skimage
    convention). NHWC inputs."""
    image = _maybe_unnormalize(image).astype(jnp.float32)
    target = _maybe_unnormalize(target).astype(jnp.float32)

    c = image.shape[-1]
    kernel = _gaussian_kernel(kernel_size, sigma)
    kernel = jnp.broadcast_to(
        kernel[:, :, None, None], (kernel_size, kernel_size, 1, c)
    )

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    c1 = (0.01 * max_value) ** 2
    c2 = (0.03 * max_value) ** 2
    mu_x = filt(image)
    mu_y = filt(target)
    sigma_x = filt(image * image) - mu_x * mu_x
    sigma_y = filt(target * target) - mu_y * mu_y
    sigma_xy = filt(image * target) - mu_x * mu_y
    numerator = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    denominator = (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.mean(numerator / denominator)


class PSNRSSIMEvaluator:
    """Reference PSNRSSIMEvaluator (psnr_ssim.py:8-39)."""

    def __init__(self, max_value: float = 1.0, ssim_kernel_size: int = 5):
        self.max_value = max_value
        self.ssim_kernel_size = ssim_kernel_size

    def psnr(self, image: Array, target: Array) -> Array:
        assert len(image) == 1, (
            "Batch size of images must be one in order to get a meaningful "
            "psnr result"
        )
        return psnr(image, target, self.max_value)

    def ssim(self, image: Array, target: Array) -> Array:
        assert len(image) == 1, (
            "Batch size of images must be one in order to get a meaningful "
            "ssim result"
        )
        return ssim(image, target, self.ssim_kernel_size,
                    max_value=self.max_value)

    def psnr_and_ssim(self, image: Array, target: Array) -> Tuple[Array, Array]:
        return self.psnr(image, target), self.ssim(image, target)
