"""StyleGAN autoencoder compositions: encoder + (frozen-ish) generator
decoder.

Capability parity with the reference
(/root/reference/stylegan_code_finder/networks/encoder/autoencoder.py:13-196),
flax re-design: each composition is one Module holding `encoder` and
`decoder` submodules; the reference's `trainable_parameters()` selection
becomes optax-mask construction (`encoder_param_mask`) since freezing in a
functional world is "don't update", not "requires_grad=False".

PRNG streams: "noise" when a composition draws generator noise.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from synthesis_in_style_tpu.models.encoder import CodeLatents, Latents

Array = jax.Array


def is_wplus(latents: Latents) -> bool:
    return latents.latent is not None and latents.latent.ndim == 3


def encoder_param_mask(params, encoder_key: str = "encoder"):
    """optax mask: True for encoder params (trainable), False for decoder
    (reference trainable_parameters returns only encoder params,
    autoencoder.py:33-50; UpdateDisabler freezes the decoder)."""
    import jax.tree_util as jtu

    def mask_at(path, _):
        return path[0].key == encoder_key

    return jtu.tree_map_with_path(mask_at, params)


class StyleganAutoencoder(nn.Module):
    """encode → decode (reference StyleganAutoencoder, autoencoder.py:13-52)."""

    encoder: nn.Module
    decoder: nn.Module
    use_generated_noise: bool = True

    def encode(self, x: Array, train: bool = False) -> Latents:
        return self.encoder(x, train=train)

    def decode(self, latents: Latents) -> Array:
        # Without predicted noise, draw FRESH random noise every forward
        # (reference forward sets latent_codes.noise = decoder.make_noise(),
        # i.e. new torch.randn maps per call, autoencoder.py:34-38) — NOT the
        # generator's fixed noise buffers.
        noise = list(latents.noise) if latents.noise is not None else None
        image, _ = self.decoder(
            [latents.latent],
            input_is_latent=is_wplus(latents),
            noise=noise,
            randomize_noise=noise is None,
        )
        return image

    def __call__(self, x: Array, train: bool = False) -> Array:
        latents = self.encode(x, train=train)
        if not self.use_generated_noise:
            latents = latents.replace(noise=None)
        return self.decode(latents)


class DropoutStyleganAutoencoder(nn.Module):
    """Randomly replaces predicted noise maps with fresh gaussian noise
    (reference DropoutStyleganAutoencoder, autoencoder.py:55-68). PRNG
    streams: "noise" + "dropout"."""

    encoder: nn.Module
    decoder: nn.Module
    dropout_ratio: float = 0.5

    def encode(self, x: Array, train: bool = False) -> Latents:
        return self.encoder(x, train=train)

    def __call__(self, x: Array, train: bool = False) -> Array:
        latents = self.encode(x, train=train)
        key = self.make_rng("dropout")
        mixed = []
        for i, predicted in enumerate(latents.noise):
            key, k_flip, k_noise = jax.random.split(key, 3)
            random_noise = jax.random.normal(k_noise, predicted.shape,
                                             predicted.dtype)
            keep = jax.random.uniform(k_flip) > self.dropout_ratio
            mixed.append(jnp.where(keep, predicted, random_noise))
        image, _ = self.decoder(
            [latents.latent],
            input_is_latent=is_wplus(latents),
            noise=mixed,
            randomize_noise=False,
        )
        return image


class CodeStyleganAutoencoder(nn.Module):
    """Concatenates the info code to the latent before decoding (reference
    CodeStyleganAutoencoder, autoencoder.py:71-82)."""

    encoder: nn.Module
    decoder: nn.Module

    def encode(self, x: Array, train: bool = False) -> CodeLatents:
        return self.encoder(x, train=train)

    def __call__(self, x: Array, train: bool = False) -> Array:
        latents = self.encode(x, train=train)
        latent = jnp.concatenate([latents.latent, latents.code], axis=1)
        image, _ = self.decoder(
            [latent],
            input_is_latent=False,
            noise=list(latents.noise),
            randomize_noise=False,
        )
        return image


class ContentAndStyleStyleganAutoencoder(nn.Module):
    """6-channel (content | style) input (reference autoencoder.py:85-92)."""

    encoder: nn.Module
    decoder: nn.Module

    def encode(self, x: Array, train: bool = False) -> Latents:
        return self.encoder(x, train=train)

    def __call__(self, content_images: Array, style_images: Array,
                 train: bool = False) -> Array:
        x = jnp.concatenate([content_images, style_images], axis=-1)
        latents = self.encode(x, train=train)
        noise = list(latents.noise) if latents.noise is not None else None
        image, _ = self.decoder(
            [latents.latent],
            input_is_latent=is_wplus(latents),
            noise=noise,
            randomize_noise=False,
        )
        return image


class SuperResolutionStyleganAutoencoder(nn.Module):
    """Encoder at low res, decoder at high res; missing noise maps and w+
    rows are padded (reference autoencoder.py:95-134)."""

    encoder: nn.Module
    decoder: nn.Module
    extend_noise_with_random: bool = True

    def encode(self, x: Array, train: bool = False) -> Latents:
        return self.encoder(x, train=train)

    def __call__(self, x: Array, train: bool = False) -> Array:
        enc_size = self.encoder.image_size
        # area (box-average) downsampling, matching the reference's
        # F.interpolate(mode='area') (autoencoder.py:95-134): for the integer
        # factors used here this is exact mean pooling; bilinear would only
        # mix a 2x2 neighborhood and alias
        if x.shape[1] % enc_size == 0:
            f = x.shape[1] // enc_size
            x_small = nn.avg_pool(x, (f, f), strides=(f, f))
        else:
            x_small = jax.image.resize(
                x, (x.shape[0], enc_size, enc_size, x.shape[-1]),
                method="linear", antialias=True,
            )
        x_small = jax.lax.stop_gradient(x_small)
        latents = self.encode(x_small, train=train)

        noise = list(latents.noise)
        latent = latents.latent
        if self.decoder.size > enc_size:
            num_predicted = len(noise)
            target_shapes = self.decoder.noise_shapes()
            if self.extend_noise_with_random:
                key = self.make_rng("noise")
                for shape in target_shapes[num_predicted:]:
                    key, sub = jax.random.split(key)
                    noise.append(
                        jax.random.normal(
                            sub, (x.shape[0],) + shape[1:], x.dtype
                        )
                    )
            else:
                current = noise[-1]
                for shape in target_shapes[num_predicted:]:
                    current = jax.lax.stop_gradient(
                        jax.image.resize(
                            current,
                            (current.shape[0], shape[1], shape[2], 1),
                            method="linear",
                        )
                    )
                    noise.append(current)
            if latent is not None and latent.ndim == 3:
                target_n = self.decoder.n_latent
                last = jax.lax.stop_gradient(latent[:, -1:])
                pad = jnp.repeat(last, target_n - latent.shape[1], axis=1)
                latent = jnp.concatenate([latent, pad], axis=1)

        image, _ = self.decoder(
            [latent],
            input_is_latent=(latent.ndim == 3),
            noise=noise,
            randomize_noise=False,
        )
        return image


class TwoStemStyleganAutoencoder(nn.Module):
    """Separate latent and noise encoders with selective gradient flow
    (reference TwoStemStyleganAutoencoder, autoencoder.py:137-196)."""

    latent_encoder: nn.Module
    noise_encoder: nn.Module
    decoder: nn.Module
    update_latent: bool = True
    update_noise: bool = True

    def encode(self, x: Array, train: bool = False) -> Latents:
        assert self.update_latent or self.update_noise, (
            "'update_latent' or 'update_noise' must be true for Two Stem "
            "Autoencoder"
        )
        latent = self.latent_encoder(x, train=train).latent
        if not self.update_latent:
            latent = jax.lax.stop_gradient(latent)
        if self.update_noise:
            noise = self.noise_encoder(x, train=train).noise
        else:
            key = self.make_rng("noise")
            noise = []
            for shape in self.decoder.noise_shapes():
                key, sub = jax.random.split(key)
                noise.append(
                    jax.random.normal(sub, (x.shape[0],) + shape[1:], x.dtype)
                )
            noise = tuple(noise)
        return Latents(latent=latent, noise=noise)

    def __call__(self, x: Array, train: bool = False) -> Array:
        latents = self.encode(x, train=train)
        image, _ = self.decoder(
            [latents.latent],
            input_is_latent=is_wplus(latents),
            noise=list(latents.noise),
            randomize_noise=False,
        )
        return image
