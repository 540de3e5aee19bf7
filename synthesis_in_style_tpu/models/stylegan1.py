"""StyleGAN1 — progressive AdaIN generator + discriminator, TPU-native flax.

Capability parity with the reference
(/root/reference/stylegan_code_finder/networks/stylegan1/model.py), NHWC:

* runtime equalized-lr scaling sqrt(2/fan_in) (reference EqualLR hook :27-55)
  applied at call time to normal-init params;
* FusedUpsample / FusedDownsample: zero-pad the kernel and average the four
  shifted taps, then stride-2 conv-transpose / conv (reference :59-115);
* 3x3 binomial depthwise Blur (reference :125-182 — the custom autograd
  Function existed only to cheapen double-grads; XLA differentiates the conv
  natively);
* AdaIN = InstanceNorm (no affine) + per-style scale/shift with gamma-bias 1
  (reference :270-287);
* progressive growing: `step` selects the active resolution, `alpha` blends
  the previous to_rgb (generator :427-460, discriminator :578-604);
* same `return_intermediate_activations` dict keyed by block index
  (generator forward :446-448).

`step` is a static python int (per-resolution graphs compile once each —
exactly the progressive-training usage); `alpha` is traced.

Note: parameters materialize lazily for the step used at `init` (the torch
reference allocates every progression block upfront). Initialize at the step
you train at; when growing to the next step, re-init and copy the shared
subtree (all lower blocks' params are name-stable across steps).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array

BLUR_KERNEL = jnp.asarray(
    [[1.0, 2.0, 1.0], [2.0, 4.0, 2.0], [1.0, 2.0, 1.0]]
) / 16.0


def _equal_scale(shape_fan_in: int) -> float:
    return math.sqrt(2.0 / shape_fan_in)


class EqualLinear(nn.Module):
    """(reference EqualLinear :197-208)."""

    out_dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_dim = x.shape[-1]
        weight = self.param(
            "weight", nn.initializers.normal(stddev=1.0), (in_dim, self.out_dim)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_dim,))
        return x @ (weight * _equal_scale(in_dim)) + bias


class EqualConv(nn.Module):
    """(reference EqualConv2d :185-194)."""

    features: int
    kernel_size: int
    padding: int = 0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        k = self.kernel_size
        weight = self.param(
            "weight", nn.initializers.normal(stddev=1.0),
            (k, k, in_ch, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        out = jax.lax.conv_general_dilated(
            x, weight * _equal_scale(in_ch * k * k), (1, 1),
            [(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias


def blur_3x3(x: Array) -> Array:
    """Depthwise binomial blur (reference Blur :167-182)."""
    c = x.shape[-1]
    kernel = jnp.broadcast_to(BLUR_KERNEL[:, :, None, None], (3, 3, 1, c))
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def _fused_kernel(weight: Array) -> Array:
    """Pad + average four shifted taps (reference FusedUp/Downsample
    :74-83, :103-112). weight HWIO."""
    padded = jnp.pad(weight, ((1, 1), (1, 1), (0, 0), (0, 0)))
    return (
        padded[1:, 1:] + padded[:-1, 1:] + padded[1:, :-1] + padded[:-1, :-1]
    ) / 4.0


class FusedUpsample(nn.Module):
    """(reference :59-86)."""

    features: int
    kernel_size: int
    padding: int = 0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        k = self.kernel_size
        weight = self.param(
            "weight", nn.initializers.normal(stddev=1.0),
            (k, k, in_ch, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        kernel = _fused_kernel(weight * _equal_scale(in_ch * k * k))
        kk = kernel.shape[0]
        # conv_transpose(stride 2, pad p) == dilated conv with flipped kernel
        pad = kk - 1 - self.padding
        out = jax.lax.conv_general_dilated(
            x, jnp.flip(kernel, (0, 1)), (1, 1), [(pad, pad)] * 2,
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias


class FusedDownsample(nn.Module):
    """(reference :89-115)."""

    features: int
    kernel_size: int
    padding: int = 0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        k = self.kernel_size
        weight = self.param(
            "weight", nn.initializers.normal(stddev=1.0),
            (k, k, in_ch, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        kernel = _fused_kernel(weight * _equal_scale(in_ch * k * k))
        out = jax.lax.conv_general_dilated(
            x, kernel, (2, 2), [(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias


class AdaptiveInstanceNorm(nn.Module):
    """(reference :270-287)."""

    @nn.compact
    def __call__(self, x: Array, style: Array) -> Array:
        channels = x.shape[-1]
        style_out = EqualLinear(channels * 2, name="style")(style)
        gamma, beta = jnp.split(style_out, 2, axis=-1)
        gamma = gamma + 1.0  # bias init gamma=1 (reference :278)
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        normed = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        return gamma[:, None, None, :] * normed + beta[:, None, None, :]


class NoiseInjection(nn.Module):
    """equal_lr-scaled per-channel noise weight (reference :290-296 wrapped
    by equal_lr at :377)."""

    @nn.compact
    def __call__(self, image: Array, noise: Array) -> Array:
        channels = image.shape[-1]
        # zeros init (reference NoiseInjection weight = torch.zeros wrapped by
        # equal_lr, model.py:290-296): noise is a no-op at the start of training
        weight = self.param(
            "weight", nn.initializers.zeros, (1, 1, 1, channels)
        )
        return image + weight * _equal_scale(channels) * noise


class StyledConvBlock(nn.Module):
    """(reference StyledConvBlock :308-374)."""

    in_channel: int
    out_channel: int
    kernel_size: int = 3
    padding: int = 1
    initial: bool = False
    upsample: bool = False
    fused: bool = False

    @nn.compact
    def __call__(self, x: Array, styles: Array, noise: Array) -> Array:
        if self.initial:
            const = self.param(
                "input", nn.initializers.normal(stddev=1.0),
                (1, 4, 4, self.in_channel),
            )
            out = jnp.repeat(const, x.shape[0], axis=0).astype(styles.dtype)
        elif self.upsample:
            if self.fused:
                out = FusedUpsample(
                    self.out_channel, self.kernel_size, self.padding,
                    name="conv1_fused",
                )(x)
                out = blur_3x3(out)
            else:
                b, h, w, c = x.shape
                up = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
                out = EqualConv(
                    self.out_channel, self.kernel_size, self.padding,
                    name="conv1",
                )(up)
                out = blur_3x3(out)
        else:
            out = EqualConv(
                self.out_channel, self.kernel_size, self.padding, name="conv1"
            )(x)

        out = NoiseInjection(name="noise1")(out, noise)
        out = nn.leaky_relu(out, 0.2)
        out = AdaptiveInstanceNorm(name="adain1")(out, styles[:, 0])

        out = EqualConv(
            self.out_channel, self.kernel_size, self.padding, name="conv2"
        )(out)
        out = NoiseInjection(name="noise2")(out, noise)
        out = nn.leaky_relu(out, 0.2)
        out = AdaptiveInstanceNorm(name="adain2")(out, styles[:, 1])
        return out


PROGRESSION_CHANNELS = [
    (512, 512), (512, 512), (512, 512), (512, 512), (512, 256),
    (256, 128), (128, 64), (64, 32), (32, 16),
]


class ProgressiveGenerator(nn.Module):
    """(reference stylegan1 Generator :377-460)."""

    code_dim: int = 512
    fused: bool = True

    @staticmethod
    def get_channels() -> Dict[int, int]:
        return {4: 512, 8: 512, 16: 512, 32: 512, 64: 256, 128: 128,
                256: 64, 512: 32, 1024: 16}

    @nn.compact
    def __call__(
        self,
        style: List[Array],
        noise: List[Array],
        step: int = 0,
        alpha: float = -1.0,
        return_intermediate_activations: bool = False,
    ):
        assert len(style) == 1, (
            "For projecting only one style code is allowed, mixing has to be "
            "done earlier"
        )
        style = style[0]
        if style.ndim != 3:
            style = jnp.repeat(style[:, None, :], (step + 1) * 2, axis=1)
        assert style.shape[1] >= step * 2

        acts: Optional[Dict[int, Array]] = (
            {} if return_intermediate_activations else None
        )
        out = noise[0]
        out_prev = None
        image = None
        for i, (in_ch, out_ch) in enumerate(PROGRESSION_CHANNELS[: step + 1]):
            fused = self.fused and i >= 5  # resolutions >= 128 (reference)
            style_step = style[:, i * 2 : i * 2 + 2]
            if i > 0 and step > 0:
                out_prev = out
            out = StyledConvBlock(
                in_ch, out_ch, 3, 1,
                initial=(i == 0), upsample=(i > 0), fused=fused,
                name=f"progression_{i}",
            )(out, style_step, noise[i])
            if acts is not None:
                acts[i] = jax.lax.stop_gradient(out)
            if i == step:
                image = EqualConv(3, 1, name=f"to_rgb_{i}")(out)
                if i > 0:
                    # always build the skip branch so the param tree does not
                    # depend on alpha; select with where (traced-alpha safe)
                    skip = EqualConv(3, 1, name=f"to_rgb_{i - 1}")(out_prev)
                    b, h, w, c = skip.shape
                    skip = jax.image.resize(
                        skip, (b, h * 2, w * 2, c), method="nearest"
                    )
                    alpha_arr = jnp.asarray(alpha, image.dtype)
                    blended = (1 - alpha_arr) * skip + alpha_arr * image
                    use_blend = jnp.logical_and(alpha_arr >= 0, alpha_arr < 1)
                    image = jnp.where(use_blend, blended, image)
        return image, acts


class StyledGenerator(nn.Module):
    """(reference StyledGenerator :463-530)."""

    size: int
    code_dim: int = 512
    n_mlp: int = 8

    @property
    def step(self) -> int:
        return int(math.log2(self.size)) - 2

    @property
    def n_latent(self) -> int:
        return (self.step + 1) * 2

    @property
    def style_dim(self) -> int:
        return self.code_dim

    def noise_shapes(self) -> List[Tuple[int, int, int, int]]:
        return [(1, 4 * 2**i, 4 * 2**i, 1) for i in range(self.step + 1)]

    def setup(self):
        self.style_layers = [
            EqualLinear(self.code_dim, name=f"style_{i}")
            for i in range(self.n_mlp)
        ]
        self.generator = ProgressiveGenerator(self.code_dim)

    def style(self, z: Array) -> Array:
        out = z * jax.lax.rsqrt(
            jnp.mean(jnp.square(z), axis=-1, keepdims=True) + 1e-8
        )
        for layer in self.style_layers:
            out = nn.leaky_relu(layer(out), 0.2)
        return out

    def mean_style(self, z: Array) -> Array:
        return jnp.mean(self.style(z), axis=0, keepdims=True)

    def __call__(
        self,
        input: List[Array],
        noise: Optional[List[Array]] = None,
        alpha: float = 1.0,
        input_is_latent: bool = False,
        return_intermediate_activations: bool = False,
        step: Optional[int] = None,
        randomize_noise: bool = True,
    ):
        # `randomize_noise` exists for decoder-API compatibility with the
        # stylegan2 Generator (autoencoder compositions pass it): stylegan1
        # has no registered noise buffers (reference model.py:463-530), so
        # None-noise always means freshly drawn maps.
        del randomize_noise
        step = self.step if step is None else step
        if not input_is_latent:
            styles = [self.style(t) for t in input]
        else:
            styles = list(input)
        if noise is None:
            key = self.make_rng("noise")
            noise = []
            batch = styles[0].shape[0]
            for i in range(step + 1):
                key, sub = jax.random.split(key)
                size = 4 * 2**i
                noise.append(
                    jax.random.normal(sub, (batch, size, size, 1))
                )
        return self.generator(
            styles, noise, step, alpha,
            return_intermediate_activations=return_intermediate_activations,
        )


class ProgressiveDiscriminator(nn.Module):
    """(reference stylegan1 Discriminator :533-604).

    `default_step` lets factory users (fixed-resolution adversarial
    training, models/factory.py get_discriminator variant 1) bake in the
    step matching their image size so call sites that never pass `step`
    (e.g. updaters/adversarial_updater.py) run the full pyramid."""

    fused: bool = True
    from_rgb_activate: bool = False
    default_step: int = 0

    @nn.compact
    def __call__(
        self, x: Array, step: Optional[int] = None, alpha: float = -1.0
    ) -> Array:
        step = self.default_step if step is None else step
        down_channels = [
            (16, 32), (32, 64), (64, 128), (128, 256), (256, 512),
            (512, 512), (512, 512), (512, 512),
        ]
        n_layer = len(down_channels) + 1
        out = None
        for i in range(step, -1, -1):
            index = n_layer - i - 1
            if i == step:
                out = EqualConv(
                    down_channels[index][0] if index < len(down_channels)
                    else 512,
                    1, name=f"from_rgb_{index}",
                )(x)
                if self.from_rgb_activate:
                    out = nn.leaky_relu(out, 0.2)
            if i == 0:
                std = jnp.sqrt(jnp.var(out, axis=0) + 1e-8)
                mean_std = jnp.mean(std)
                stat = jnp.broadcast_to(
                    mean_std, (out.shape[0], out.shape[1], out.shape[2], 1)
                )
                out = jnp.concatenate([out, stat], axis=-1)
                out = EqualConv(512, 3, 1, name="final_conv1")(out)
                out = nn.leaky_relu(out, 0.2)
                out = EqualConv(512, 4, 0, name="final_conv2")(out)
                out = nn.leaky_relu(out, 0.2)
            else:
                in_ch, out_ch = down_channels[index]
                fused = self.fused and index < 4
                # reference ConvBlock: conv1 maps in->OUT channels, conv2
                # out->out (model.py:236-255)
                out = EqualConv(out_ch, 3, 1, name=f"conv_{index}_1")(out)
                out = nn.leaky_relu(out, 0.2)
                out = blur_3x3(out)
                if fused:
                    out = FusedDownsample(
                        out_ch, 3, 1, name=f"conv_{index}_2"
                    )(out)
                else:
                    out = EqualConv(out_ch, 3, 1, name=f"conv_{index}_2")(out)
                    out = nn.avg_pool(out, (2, 2), strides=(2, 2))
                out = nn.leaky_relu(out, 0.2)
                if i == step and i > 0:
                    skip = nn.avg_pool(x, (2, 2), strides=(2, 2))
                    skip = EqualConv(
                        out_ch, 1, name=f"from_rgb_{index + 1}"
                    )(skip)
                    alpha_arr = jnp.asarray(alpha, out.dtype)
                    blended = (1 - alpha_arr) * skip + alpha_arr * out
                    use_blend = jnp.logical_and(alpha_arr >= 0, alpha_arr < 1)
                    out = jnp.where(use_blend, blended, out)

        out = out.reshape(out.shape[0], -1)
        return EqualLinear(1, name="linear")(out)
