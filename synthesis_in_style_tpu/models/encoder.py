"""GAN-inversion encoders — image → (w / w+ latents, per-layer noise).

Capability parity with the reference encoder zoo
(/root/reference/stylegan_code_finder/networks/encoder/u_net_like_encoder.py:12-264,
resnet_based_encoder.py:8-60), TPU-native flax NHWC:

* `UNetLikeEncoder` trunk: a ResNet BasicBlock pyramid from image_size down
  to 4px; at every resolution step the variants tap latent codes (global
  average pool → 1x1 conv) and/or noise maps (1x1 conv, one channel)
  (reference :12-81). Noise lists are returned smallest-resolution first,
  matching the generator's noise-buffer order.
* Variants: WPlusEncoder (w+ + noise), WPlusResnetNoiseEncoder,
  WEncoder (single w + noise), WWPlusEncoder (w+ summed to w),
  WCodeEncoder (w + info code), WPlusNoNoiseEncoder, WNoNoiseEncoder,
  NoiseEncoder (noise only), and the plain resnet `Encoder`
  (resnet_based_encoder.py).
* `Latents` / `CodeLatents` are pytrees (reference latent_projecting
  dataclasses, latent_projecting/__init__.py:16-102).
"""

from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple

import flax
import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


@flax.struct.dataclass
class Latents:
    latent: Optional[Array]
    noise: Optional[Tuple[Array, ...]]


@flax.struct.dataclass
class CodeLatents:
    latent: Optional[Array]
    noise: Optional[Tuple[Array, ...]]
    code: Optional[Array] = None


class BasicBlock(nn.Module):
    """torchvision ResNet BasicBlock (3x3-BN-ReLU-3x3-BN + skip).

    `downsample_bn=False` reproduces the reference's noise resblocks, whose
    skip path is a bare 1x1 conv with no BatchNorm
    (u_net_like_encoder.py:119-129)."""

    features: int
    stride: int = 1
    use_downsample: bool = False
    downsample_bn: bool = True

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        identity = x
        out = nn.Conv(
            self.features, (3, 3), strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)], use_bias=False, name="conv1",
        )(x)
        out = nn.BatchNorm(use_running_average=not train, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.features, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            name="conv2",
        )(out)
        out = nn.BatchNorm(use_running_average=not train, name="bn2")(out)
        if self.use_downsample or self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                name="downsample_conv",
            )(x)
            if self.downsample_bn:
                identity = nn.BatchNorm(
                    use_running_average=not train, name="downsample_bn"
                )(identity)
        return nn.relu(out + identity)


def _gap(x: Array) -> Array:
    """Global average pool to (B, 1, 1, C)."""
    return jnp.mean(x, axis=(1, 2), keepdims=True)


class UNetLikeEncoder(nn.Module):
    """Shared trunk (reference UNetLikeEncoder, u_net_like_encoder.py:12-81).

    Subclasses configure which heads exist via class attrs:
      with_latent_heads  — per-step latent taps (w+)
      with_single_latent — one final latent (w)
      with_noise_heads   — per-step noise taps
      noise_as_resblock  — noise taps are BasicBlocks (WPlusResnetNoise)
      with_code_head     — extra info-code head (WCode)
    """

    image_size: int
    latent_size: int
    num_input_channels: int
    size_channel_map: Any
    target_size: int = 4
    stylegan_variant: int = 2

    with_latent_heads: bool = False
    with_single_latent: bool = False
    with_noise_heads: bool = False
    noise_as_resblock: bool = False
    with_code_head: bool = False
    code_dim: int = 0

    @property
    def log_input_size(self) -> int:
        return int(math.log2(self.image_size))

    @property
    def log_target_size(self) -> int:
        return int(math.log2(self.target_size))

    @property
    def num_steps(self) -> int:
        """resnet_blocks count = 1 (start) + halvings."""
        return 1 + (self.log_input_size - self.log_target_size)

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        scm = {int(k): v for k, v in self.size_channel_map.items()}
        sizes = [self.image_size] + [
            2**s
            for s in range(self.log_input_size - 1, self.log_target_size - 1, -1)
        ]

        latent_codes: List[Array] = []
        noise_codes: List[Array] = []
        h = x
        for i, size in enumerate(sizes):
            stride = 1 if i == 0 else 2
            h = BasicBlock(
                scm[size], stride=stride, use_downsample=True,
                name=f"resnet_blocks_{i}",
            )(h, train=train)

            if self.with_latent_heads:
                latent_codes.append(
                    nn.Conv(self.latent_size, (1, 1), name=f"to_latent_{i}")(
                        _gap(h)
                    ).reshape(h.shape[0], self.latent_size)
                )
            if self.with_noise_heads:
                if self.noise_as_resblock:
                    noise_codes.append(
                        BasicBlock(
                            1, use_downsample=True, downsample_bn=False,
                            name=f"to_noise_{i}",
                        )(h, train=train)
                    )
                else:
                    noise_codes.append(
                        nn.Conv(1, (1, 1), name=f"to_noise_{i}")(h)
                    )

            h = BasicBlock(scm[size], name=f"intermediate_blocks_{i}")(
                h, train=train
            )

            if self.with_latent_heads:
                latent_codes.append(
                    nn.Conv(
                        self.latent_size, (1, 1),
                        name=f"intermediate_to_latent_{i}",
                    )(_gap(h)).reshape(h.shape[0], self.latent_size)
                )
            if (
                self.with_noise_heads
                and self.stylegan_variant == 2
                and i < len(sizes) - 1
            ):
                if self.noise_as_resblock:
                    noise_codes.append(
                        BasicBlock(
                            1, use_downsample=True, downsample_bn=False,
                            name=f"intermediate_to_noise_{i}",
                        )(h, train=train)
                    )
                else:
                    noise_codes.append(
                        nn.Conv(1, (1, 1), name=f"intermediate_to_noise_{i}")(h)
                    )

        latent = None
        code = None
        if self.with_latent_heads:
            latent = jnp.stack(list(reversed(latent_codes)), axis=1)
        elif self.with_single_latent:
            pooled = _gap(h)
            latent = nn.Conv(self.latent_size, (1, 1), name="to_latent")(
                pooled
            ).reshape(h.shape[0], self.latent_size)
            if self.with_code_head:
                code = nn.Conv(self.code_dim, (1, 1), name="to_code")(
                    pooled
                ).reshape(h.shape[0], self.code_dim)

        noise = tuple(reversed(noise_codes)) if self.with_noise_heads else None
        if self.with_code_head:
            return CodeLatents(latent=latent, noise=noise, code=code)
        return Latents(latent=latent, noise=noise)


def WPlusEncoder(image_size, latent_size, num_input_channels, size_channel_map,
                 stylegan_variant: int = 2, **kwargs):
    """w+ latents + per-layer noise (reference :84-114)."""
    return UNetLikeEncoder(
        image_size, latent_size, num_input_channels, size_channel_map,
        stylegan_variant=stylegan_variant,
        with_latent_heads=True, with_noise_heads=True, **kwargs,
    )


def WPlusResnetNoiseEncoder(image_size, latent_size, num_input_channels,
                            size_channel_map, stylegan_variant: int = 2, **kwargs):
    """(reference :117-138)."""
    return UNetLikeEncoder(
        image_size, latent_size, num_input_channels, size_channel_map,
        stylegan_variant=stylegan_variant,
        with_latent_heads=True, with_noise_heads=True, noise_as_resblock=True,
        **kwargs,
    )


def WEncoder(image_size, latent_size, num_input_channels, size_channel_map,
             stylegan_variant: int = 2, **kwargs):
    """single w + noise (reference :141-168)."""
    return UNetLikeEncoder(
        image_size, latent_size, num_input_channels, size_channel_map,
        stylegan_variant=stylegan_variant,
        with_single_latent=True, with_noise_heads=True, **kwargs,
    )


class WWPlusEncoder(nn.Module):
    """w+ summed to w (reference :171-176)."""

    image_size: int
    latent_size: int
    num_input_channels: int
    size_channel_map: Any
    stylegan_variant: int = 2

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Latents:
        latents = UNetLikeEncoder(
            self.image_size, self.latent_size, self.num_input_channels,
            self.size_channel_map, stylegan_variant=self.stylegan_variant,
            with_latent_heads=True, with_noise_heads=True, name="inner",
        )(x, train=train)
        return Latents(latent=jnp.sum(latents.latent, axis=1), noise=latents.noise)


def WCodeEncoder(code_dim, image_size, latent_size, num_input_channels,
                 size_channel_map, stylegan_variant: int = 2, **kwargs):
    """w + info code + noise (reference :179-210)."""
    return UNetLikeEncoder(
        image_size, latent_size, num_input_channels, size_channel_map,
        stylegan_variant=stylegan_variant,
        with_single_latent=True, with_noise_heads=True, with_code_head=True,
        code_dim=code_dim, **kwargs,
    )


def WPlusNoNoiseEncoder(image_size, latent_size, num_input_channels,
                        size_channel_map, stylegan_variant: int = 2, **kwargs):
    """(reference :213-233)."""
    return UNetLikeEncoder(
        image_size, latent_size, num_input_channels, size_channel_map,
        stylegan_variant=stylegan_variant, with_latent_heads=True, **kwargs,
    )


class WNoNoiseEncoder(nn.Module):
    """(reference :236-241)."""

    image_size: int
    latent_size: int
    num_input_channels: int
    size_channel_map: Any
    stylegan_variant: int = 2

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Latents:
        latents = UNetLikeEncoder(
            self.image_size, self.latent_size, self.num_input_channels,
            self.size_channel_map, stylegan_variant=self.stylegan_variant,
            with_latent_heads=True, name="inner",
        )(x, train=train)
        return Latents(latent=jnp.sum(latents.latent, axis=1), noise=None)


def NoiseEncoder(image_size, latent_size, num_input_channels, size_channel_map,
                 stylegan_variant: int = 2, **kwargs):
    """noise only (reference :244-264)."""
    return UNetLikeEncoder(
        image_size, latent_size, num_input_channels, size_channel_map,
        stylegan_variant=stylegan_variant, with_noise_heads=True, **kwargs,
    )


class Encoder(nn.Module):
    """Plain resnet encoder: full pyramid then num_latents latent heads from
    the 4px map (reference resnet_based_encoder.py:8-60)."""

    image_size: int
    latent_size: int
    num_input_channels: int
    size_channel_map: Any
    target_size: int = 4

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        scm = {int(k): v for k, v in self.size_channel_map.items()}
        log_input = int(math.log2(self.image_size))
        log_target = int(math.log2(self.target_size))
        sizes = [self.image_size] + [
            2**s for s in range(log_input - 1, log_target - 1, -1)
        ]
        h = x
        for i, size in enumerate(sizes):
            stride = 1 if i == 0 else 2
            h = BasicBlock(
                scm[size], stride=stride, use_downsample=True,
                name=f"resnet_blocks_{i}",
            )(h, train=train)
        num_latents = (log_input - log_target) * 2 + 2
        latents = [
            nn.Conv(
                self.latent_size, (self.target_size, self.target_size),
                padding="VALID", name=f"to_latent_{i}",
            )(h).reshape(h.shape[0], self.latent_size)
            for i in range(num_latents)
        ]
        return jnp.stack(latents, axis=1)
