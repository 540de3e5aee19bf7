"""SWAGAN — wavelet-domain StyleGAN2 variant, TPU-native flax implementation.

Capability parity with the reference
(/root/reference/stylegan_code_finder/networks/swagan/model.py), re-designed
for TPU:

* **NHWC layout**; channel chunks (ll, lh, hl, hh) live on the last axis.
* The Haar DWT/IWT (reference HaarTransform/InverseHaarTransform,
  swagan/model.py:27-65) are expressed through the same fused depthwise
  `upfirdn2d` conv as the reference (down=2 / up=2 with 2-tap outer-product
  kernels) — one XLA conv per sub-band, natively twice differentiable.
* Reuses `EqualLinear` / `StyledConv` / `ConvLayer` / `minibatch_stddev`
  from `models.stylegan2` (the reference likewise imports them,
  swagan/model.py:12).
* Same `return_intermediate_activations` protocol (dict keyed 0..num_layers,
  swagan/model.py:253-276) feeding the label-synthesis pipeline. Activations
  are in wavelet space at half the pixel resolution, exactly as in the
  reference.

Structure notes (vs. plain StyleGAN2): the synthesis pyramid runs in wavelet
space — `log_size = log2(size) - 1` (swagan/model.py:141), ToRGB emits 12
channels (3 sub-band groups x RGB) with an iwt→upsample→dwt skip
(:69-91), and the final image is one InverseHaarTransform (:279).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from synthesis_in_style_tpu.models.stylegan2 import (
    ConvLayer,
    EqualLinear,
    ModulatedConv2d,
    StyledConv,
    generator_channels,
    minibatch_stddev,
    pixel_norm,
)
from synthesis_in_style_tpu.ops import (
    downsample_2d,
    make_kernel,
    upfirdn2d,
    upsample_2d,
)

Array = jax.Array


def haar_wavelet_kernels() -> Tuple[jnp.ndarray, ...]:
    """The four 2x2 Haar analysis kernels (reference get_haar_wavelet,
    swagan/model.py:14-24): outer products of l = [1,1]/sqrt(2) and
    h = [-1,1]/sqrt(2), ordered (ll, lh, hl, hh)."""
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    l = jnp.array([inv_sqrt2, inv_sqrt2], dtype=jnp.float32)
    h = jnp.array([-inv_sqrt2, inv_sqrt2], dtype=jnp.float32)
    ll = jnp.outer(l, l)
    lh = jnp.outer(h, l)  # varies along y with h (reference h.T * l)
    hl = jnp.outer(l, h)
    hh = jnp.outer(h, h)
    return ll, lh, hl, hh


def haar_transform(x: Array) -> Array:
    """Forward Haar DWT: (B, H, W, C) -> (B, H/2, W/2, 4C), channel order
    [ll | lh | hl | hh] (reference HaarTransform, swagan/model.py:27-45)."""
    bands = [upfirdn2d(x, k, down=2) for k in haar_wavelet_kernels()]
    return jnp.concatenate(bands, axis=-1)


def inverse_haar_transform(x: Array) -> Array:
    """Inverse Haar DWT: (B, H, W, 4C) -> (B, 2H, 2W, C) (reference
    InverseHaarTransform, swagan/model.py:47-65; note the lh/hl sign flip
    and the pad=(1, 0, 1, 0))."""
    ll, lh, hl, hh = jnp.split(x, 4, axis=-1)
    kll, klh, khl, khh = haar_wavelet_kernels()
    out = upfirdn2d(ll, kll, up=2, pad=(1, 0, 1, 0))
    out = out + upfirdn2d(lh, -klh, up=2, pad=(1, 0, 1, 0))
    out = out + upfirdn2d(hl, -khl, up=2, pad=(1, 0, 1, 0))
    out = out + upfirdn2d(hh, khh, up=2, pad=(1, 0, 1, 0))
    return out


class WaveletToRGB(nn.Module):
    """1x1 modulated conv to 12 wavelet-RGB channels with iwt→upsample→dwt
    skip accumulation (reference swagan ToRGB, swagan/model.py:69-91)."""

    upsample: bool = True
    blur_kernel: Sequence[int] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x: Array, style: Array, skip: Optional[Array] = None) -> Array:
        out = ModulatedConv2d(12, 1, demodulate=False, name="conv")(x, style)
        bias = self.param("bias", nn.initializers.zeros, (12,))
        out = out + bias.astype(out.dtype)
        if skip is not None:
            skip = inverse_haar_transform(skip)
            skip = upsample_2d(skip, make_kernel(list(self.blur_kernel)), 2)
            skip = haar_transform(skip)
            out = out + skip
        return out


class Generator(nn.Module):
    """SWAGAN generator (reference swagan Generator, swagan/model.py:94-283).

    PRNG streams: "noise", "mixing" — same contract as models.stylegan2.
    """

    size: int
    style_dim: int
    n_mlp: int
    channel_multiplier: int = 2
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    lr_mlp: float = 0.01
    # w8a8 int8 serving path for the StyledConv stack (see
    # models.stylegan2.Generator.quantized); WaveletToRGB stays full
    # precision (1x1 conv to 12 wavelet bands on the image path).
    quantized: bool = False

    @property
    def log_size(self) -> int:
        # wavelet-space pyramid is one octave shallower (model.py:141)
        return int(math.log2(self.size)) - 1

    @property
    def num_layers(self) -> int:
        return (self.log_size - 2) * 2 + 1

    @property
    def n_latent(self) -> int:
        return self.log_size * 2 - 2

    @property
    def channels(self) -> Dict[int, int]:
        return generator_channels(self.channel_multiplier)

    def noise_shapes(self) -> List[Tuple[int, int, int, int]]:
        shapes = []
        for layer_idx in range(self.num_layers):
            res = (layer_idx + 5) // 2
            shapes.append((1, 2**res, 2**res, 1))
        return shapes

    def setup(self):
        channels = self.channels
        self.style_layers = [
            EqualLinear(
                self.style_dim,
                lr_mul=self.lr_mlp,
                activation=True,
                name=f"style_{i + 1}",
            )
            for i in range(self.n_mlp)
        ]
        self.const_input = self.param(
            "input", nn.initializers.normal(stddev=1.0), (1, 4, 4, channels[4])
        )
        self.conv1 = StyledConv(
            channels[4], 3, blur_kernel=self.blur_kernel, quantized=self.quantized
        )
        self.to_rgb1 = WaveletToRGB(upsample=False)

        convs = []
        to_rgbs = []
        for res_log in range(3, self.log_size + 1):
            out_channel = channels[2**res_log]
            convs.append(
                StyledConv(
                    out_channel,
                    3,
                    upsample=True,
                    blur_kernel=self.blur_kernel,
                    quantized=self.quantized,
                )
            )
            convs.append(
                StyledConv(
                    out_channel,
                    3,
                    blur_kernel=self.blur_kernel,
                    quantized=self.quantized,
                )
            )
            to_rgbs.append(WaveletToRGB())
        self.convs = convs
        self.to_rgbs = to_rgbs

        self.noise_buffers = [
            self.variable(
                "noises",
                f"noise_{i}",
                lambda s=shp, i=i: jax.random.normal(jax.random.PRNGKey(i), s),
            )
            for i, shp in enumerate(self.noise_shapes())
        ]

    def style(self, z: Array) -> Array:
        out = pixel_norm(z)
        for layer in self.style_layers:
            out = layer(out)
        return out

    def mean_latent(self, key: Array, n_latent: int) -> Array:
        z = jax.random.normal(key, (n_latent, self.style_dim))
        return jnp.mean(self.style(z), axis=0, keepdims=True)

    def __call__(
        self,
        styles: Sequence[Array],
        return_latents: bool = False,
        inject_index: Optional[Array] = None,
        truncation: float = 1.0,
        truncation_latent: Optional[Array] = None,
        input_is_latent: bool = False,
        noise: Optional[Sequence[Optional[Array]]] = None,
        randomize_noise: bool = True,
        return_intermediate_activations: bool = False,
    ) -> Tuple[Array, Any]:
        if not input_is_latent:
            styles = [self.style(s) for s in styles]

        if truncation < 1:
            assert truncation_latent is not None
            styles = [
                truncation_latent + truncation * (s - truncation_latent)
                for s in styles
            ]

        n_latent = self.n_latent
        if len(styles) < 2:
            if styles[0].ndim == 3:
                latent = styles[0]
            else:
                latent = jnp.repeat(styles[0][:, None, :], n_latent, axis=1)
        else:
            if inject_index is None:
                inject_index = jax.random.randint(
                    self.make_rng("mixing"), (), 1, n_latent
                )
            layer_pos = jnp.arange(n_latent)[None, :, None]
            latent = jnp.where(
                layer_pos < inject_index,
                styles[0][:, None, :],
                styles[1][:, None, :],
            )

        batch = latent.shape[0]

        if noise is None:
            if randomize_noise:
                noise = [None] * self.num_layers
            else:
                noise = [buf.value for buf in self.noise_buffers]

        acts: Optional[Dict[int, Array]] = (
            {} if return_intermediate_activations else None
        )

        out = jnp.repeat(self.const_input, batch, axis=0).astype(latent.dtype)
        if acts is not None:
            acts[0] = jax.lax.stop_gradient(out)

        out = self.conv1(out, latent[:, 0], noise=noise[0])
        if acts is not None:
            acts[1] = jax.lax.stop_gradient(out)

        skip = self.to_rgb1(out, latent[:, 1])

        i = 1
        for conv1, conv2, noise1, noise2, to_rgb in zip(
            self.convs[::2],
            self.convs[1::2],
            noise[1::2],
            noise[2::2],
            self.to_rgbs,
        ):
            out = conv1(out, latent[:, i], noise=noise1)
            if acts is not None:
                acts[i + 1] = jax.lax.stop_gradient(out)
            out = conv2(out, latent[:, i + 1], noise=noise2)
            if acts is not None:
                acts[i + 2] = jax.lax.stop_gradient(out)
            skip = to_rgb(out, latent[:, i + 2], skip)
            i += 2

        image = inverse_haar_transform(skip)

        if return_latents:
            return image, latent
        if return_intermediate_activations:
            return image, acts
        return image, None


class ConvBlock(nn.Module):
    """Two ConvLayers, second downsampling (reference swagan ConvBlock,
    swagan/model.py:286-296)."""

    out_channel: int
    blur_kernel: Sequence[int] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_channel = x.shape[-1]
        out = ConvLayer(in_channel, 3, name="conv1")(x)
        out = ConvLayer(
            self.out_channel, 3, downsample=True, blur_kernel=self.blur_kernel,
            name="conv2",
        )(out)
        return out


class FromRGB(nn.Module):
    """Wavelet-pyramid input tap (reference swagan FromRGB,
    swagan/model.py:300-322): optionally steps the wavelet image down one
    octave (iwt → blur-downsample → dwt), then 1x1-convs it into the trunk.
    Returns (downsampled wavelet image, trunk features)."""

    out_channel: int
    downsample: bool = True
    blur_kernel: Sequence[int] = (1, 3, 3, 1)

    @nn.compact
    def __call__(
        self, x: Array, skip: Optional[Array] = None
    ) -> Tuple[Array, Array]:
        if self.downsample:
            x = inverse_haar_transform(x)
            x = downsample_2d(x, make_kernel(list(self.blur_kernel)), 2)
            x = haar_transform(x)
        out = ConvLayer(self.out_channel, 1, name="conv")(x)
        if skip is not None:
            out = out + skip
        return x, out


class Discriminator(nn.Module):
    """SWAGAN discriminator (reference swagan Discriminator,
    swagan/model.py:325-399): DWT input, per-octave FromRGB taps."""

    size: int
    channel_multiplier: int = 2
    blur_kernel: Sequence[int] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        channels = generator_channels(self.channel_multiplier)
        log_size = int(math.log2(self.size)) - 1

        x = haar_transform(x)
        out = None

        in_channel = channels[self.size]
        idx = 0
        for i in range(log_size, 2, -1):
            x, out = FromRGB(
                in_channel,
                downsample=(i != log_size),
                name=f"from_rgbs_{idx}",
            )(x, out)
            out = ConvBlock(
                channels[2 ** (i - 1)],
                blur_kernel=self.blur_kernel,
                name=f"convs_{idx}",
            )(out)
            in_channel = channels[2 ** (i - 1)]
            idx += 1

        _, out = FromRGB(channels[4], name=f"from_rgbs_{idx}")(x, out)

        out = minibatch_stddev(out, group_size=4, num_features=1)
        out = ConvLayer(channels[4], 3, name="final_conv")(out)

        out = out.reshape(out.shape[0], -1)
        out = EqualLinear(channels[4], activation=True, name="final_linear_0")(out)
        out = EqualLinear(1, name="final_linear_1")(out)
        return out
