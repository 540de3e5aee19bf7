"""StyleGAN2 generator & discriminator — TPU-native flax implementation.

Capability parity with the reference
(/root/reference/stylegan_code_finder/networks/stylegan2/model.py), re-designed
for TPU rather than translated:

* **NHWC layout** everywhere (TPU-preferred; reference is NCHW).
* **ModulatedConv2d** uses the mathematically-equivalent
  "scale-input / demodulate-output" formulation instead of the reference's
  per-sample grouped-conv weight trick (model.py:237-278): the conv keeps a
  *shared* weight so XLA tiles one large batched conv onto the MXU, and the
  per-sample style/demod factors become cheap channelwise VPU multiplies.
  Equivalence: conv is linear in per-input-channel scaling, and demod is a
  per-(sample, out-channel) scalar, so
  ``conv(x, scale*w*s) * d == d * conv(x * s, scale*w)``.
* **upfirdn2d** (blur / up / down) is the fused XLA op from
  `synthesis_in_style_tpu.ops` — no CUDA extension, natively twice
  differentiable for R1 / path-length regularization.
* **Intermediate activations**: `return_intermediate_activations=True`
  returns a dict keyed 0..num_layers of post-StyledConv feature maps
  (reference model.py:530-549) — the hook the entire label-synthesis pipeline
  depends on. NHWC.
* Noise buffers live in the flax `"noises"` variable collection
  (reference registers `noise_{i}` buffers, model.py:412-415);
  `randomize_noise=True` draws from the `"noise"` PRNG stream instead.
* Style mixing takes a traced `inject_index` (or draws one from the
  `"mixing"` PRNG stream) and selects per-layer latents with a mask — no
  data-dependent Python control flow under jit.

Parameter layouts (for the torch→jax checkpoint converter in
`synthesis_in_style_tpu.utils.checkpoint`):
  linear weight (in, out)   [torch: (out, in)]
  conv weight (kh, kw, in, out)   [torch: (out, in, kh, kw)]
  modulated conv weight (kh, kw, in, out)   [torch: (1, out, in, kh, kw)]
  constant input (1, 4, 4, C)   [torch: (1, C, 4, 4)]
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from synthesis_in_style_tpu.ops import (
    blur_2d,
    fused_leaky_relu,
    make_kernel,
    scaled_leaky_relu,
    upsample_2d,
)

Array = jax.Array


def pixel_norm(x: Array, eps: float = 1e-8) -> Array:
    """Normalize each latent vector to unit RMS (reference PixelNorm,
    model.py:15-20; channel axis is last here)."""
    return x * lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + eps)


def _conv2d(
    x: Array,
    w: Array,
    stride: int = 1,
    padding=0,
    lhs_dilation: Optional[Tuple[int, int]] = None,
    rhs_dilation: Optional[Tuple[int, int]] = None,
) -> Array:
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        lhs_dilation=lhs_dilation,
        rhs_dilation=rhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class EqualLinear(nn.Module):
    """Linear layer with runtime equalized-lr scaling (reference EqualLinear,
    model.py:133-162). Weight stored (in, out)."""

    out_dim: int
    use_bias: bool = True
    bias_init: float = 0.0
    lr_mul: float = 1.0
    activation: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_dim = x.shape[-1]
        weight = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0 / self.lr_mul),
            (in_dim, self.out_dim),
        )
        scale = (1.0 / math.sqrt(in_dim)) * self.lr_mul
        out = x @ (weight * scale).astype(x.dtype)
        bias = None
        if self.use_bias:
            bias = (
                self.param(
                    "bias",
                    nn.initializers.constant(self.bias_init),
                    (self.out_dim,),
                )
                * self.lr_mul
            ).astype(x.dtype)
        if self.activation:
            return fused_leaky_relu(out, bias)
        return out + bias if bias is not None else out


class EqualConv2d(nn.Module):
    """Conv with equalized-lr scaling (reference EqualConv2d, model.py:95-124)."""

    out_channel: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_channel = x.shape[-1]
        weight = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0),
            (self.kernel_size, self.kernel_size, in_channel, self.out_channel),
        )
        scale = 1.0 / math.sqrt(in_channel * self.kernel_size**2)
        out = _conv2d(x, weight * scale, stride=self.stride, padding=self.padding)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.out_channel,)
            )
            out = out + bias.astype(out.dtype)
        return out


class ModulatedConv2d(nn.Module):
    """Style-modulated conv (reference ModulatedConv2d, model.py:182-278),
    scale-input / demodulate-output formulation (see module docstring)."""

    out_channel: int
    kernel_size: int
    demodulate: bool = True
    upsample: bool = False
    downsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    # w8a8 dynamic-quantized conv (ops/quant.py): int8 MXU path, ~1.7-1.9x
    # per conv on v5e. Serving only — the rounding is non-differentiable.
    # Demodulation statistics always come from the unquantized f32 weights.
    quantized: bool = False

    def _mod_conv(
        self,
        x: Array,
        w: Array,
        stride: int = 1,
        padding=0,
        lhs_dilation: Optional[Tuple[int, int]] = None,
    ) -> Array:
        if self.quantized and lhs_dilation is None:
            # int8 only where it wins: the MXU int8 path gives no speedup on
            # lhs-dilated (upsample) convs (2.44 vs 2.49 ms at 32x32x512->512
            # b64 v5e), so quantizing them would pay the per-layer
            # quantize/dequantize passes for nothing; the parity-decomposed
            # alternative (ops/quant.py conv2d_w8a8_up2) is int32-exact but
            # measured slower end-to-end — upsample convs stay bf16/f32.
            from synthesis_in_style_tpu.ops.quant import conv2d_w8a8

            return conv2d_w8a8(x, w, stride=stride, padding=padding)
        return _conv2d(
            x, w, stride=stride, padding=padding, lhs_dilation=lhs_dilation
        )

    @nn.compact
    def __call__(
        self, x: Array, style: Array, fused_tail: bool = False
    ) -> Any:
        in_channel = x.shape[-1]
        k = self.kernel_size
        weight = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0),
            (k, k, in_channel, self.out_channel),
        )
        scale = 1.0 / math.sqrt(in_channel * k**2)
        w = weight * scale  # shared across the batch

        # per-sample, per-input-channel modulation
        s = EqualLinear(in_channel, bias_init=1.0, name="modulation")(style)

        demod = None
        if self.demodulate:
            # d[b,o] = rsqrt(sum_{kh,kw,i} (w*s_i)^2 + eps)
            #        = rsqrt(sum_i s_i^2 * sum_{kh,kw} w^2 + eps)
            w_sq = jnp.sum(jnp.square(w.astype(jnp.float32)), axis=(0, 1))  # (in, out)
            sigma = jnp.square(s.astype(jnp.float32)) @ w_sq  # (B, out)
            demod = lax.rsqrt(sigma + 1e-8).astype(x.dtype)

        blur_k = make_kernel(list(self.blur_kernel))

        if fused_tail:
            # Pallas fused-blur producer mode (StyledConv only, upsample +
            # k=3): emit the transposed conv with the width padding the
            # fused kernel expects — one extra zero column left (the blur's
            # left pad) and zero columns right up to the sublane tile (see
            # ops/pallas/fused_blur.py). The extra columns fall in the
            # conv's zero-pad region, so they are genuine zeros. Returns
            # the pre-blur activations and the demod scales; the caller
            # finishes blur+demod+noise+bias+act in one fused pass.
            from synthesis_in_style_tpu.ops.pallas.fused_blur import padded_width

            assert self.upsample and k == 3
            h_in = 2 * x.shape[1] + 1
            extra_r = padded_width(h_in) - h_in - 1
            x = x * s[:, None, None, :].astype(x.dtype)
            out = _conv2d(
                x,
                jnp.flip(w, (0, 1)),
                padding=((k - 1, k - 1), (k, k - 1 + extra_r)),
                lhs_dilation=(2, 2),
            )
            if demod is None:
                demod = jnp.ones((x.shape[0], self.out_channel), x.dtype)
            return out, demod

        if self.upsample:
            x = x * s[:, None, None, :].astype(x.dtype)
            # conv_transpose(stride 2, pad 0) == dilated conv with flipped kernel
            out = self._mod_conv(
                x,
                jnp.flip(w, (0, 1)),
                padding=k - 1,
                lhs_dilation=(2, 2),
            )
            p = (len(self.blur_kernel) - 2) - (k - 1)
            pad0 = (p + 1) // 2 + 1
            pad1 = p // 2 + 1
            out = blur_2d(out, blur_k, (pad0, pad1), upsample_factor=2)
        elif self.downsample:
            p = (len(self.blur_kernel) - 2) + (k - 1)
            pad0 = (p + 1) // 2
            pad1 = p // 2
            x = blur_2d(x, blur_k, (pad0, pad1))
            x = x * s[:, None, None, :].astype(x.dtype)
            out = self._mod_conv(x, w, stride=2, padding=0)
        else:
            x = x * s[:, None, None, :].astype(x.dtype)
            out = self._mod_conv(x, w, padding=k // 2)

        if demod is not None:
            out = out * demod[:, None, None, :]
        return out


class NoiseInjection(nn.Module):
    """Adds learned-scale spatial noise (reference NoiseInjection,
    model.py:281-292). Noise shape (B, H, W, 1).

    `plane_shape` mode returns the scaled (B, H, W) noise plane instead of
    adding it — the fused Pallas blur epilogue injects it itself. The rng
    call site is the same module/stream, so fused and unfused paths draw
    bit-identical noise."""

    @nn.compact
    def __call__(
        self,
        image: Optional[Array],
        noise: Optional[Array] = None,
        plane_shape: Optional[Tuple[int, int, int]] = None,
        dtype: Any = None,
    ) -> Array:
        weight = self.param("weight", nn.initializers.zeros, (1,))
        if plane_shape is not None:
            b, h, w = plane_shape
            if noise is None:
                noise = jax.random.normal(
                    self.make_rng("noise"), (b, h, w, 1), dtype
                )
            noise = jnp.broadcast_to(noise.astype(dtype), (b, h, w, 1))
            return (weight.astype(dtype) * noise)[..., 0]
        if noise is None:
            b, h, w, _ = image.shape
            noise = jax.random.normal(
                self.make_rng("noise"), (b, h, w, 1), image.dtype
            )
        return image + weight.astype(image.dtype) * noise.astype(image.dtype)


class StyledConv(nn.Module):
    """ModulatedConv2d → noise injection → fused bias+LeakyReLU
    (reference StyledConv, model.py:308-342).

    With `fused_blur` (upsample convs on TPU), the conv tail — FIR blur,
    demodulation, noise, bias, LeakyReLU — runs as ONE Pallas kernel pass
    (ops/pallas/fused_blur.py) instead of a depthwise-conv pass plus an
    elementwise pass. Same parameters, same rng stream, bf16-rounding-level
    numerics; shapes the kernel does not support fall back transparently."""

    out_channel: int
    kernel_size: int
    upsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    demodulate: bool = True
    fused_blur: bool = False
    # int8 serving path for the modulated conv (see ModulatedConv2d.quantized);
    # takes precedence over the Pallas fused-blur tail.
    quantized: bool = False

    def _fused_eligible(self, x: Array) -> bool:
        if self.quantized:
            return False
        from synthesis_in_style_tpu.ops.pallas.fused_blur import (
            padded_width,
            supported_shape,
        )

        h_in = 2 * x.shape[1] + 1
        return (
            self.fused_blur
            and self.upsample
            and self.kernel_size == 3
            and len(self.blur_kernel) == 4
            and x.shape[1] == x.shape[2]
            and supported_shape(
                (x.shape[0], h_in, padded_width(h_in), self.out_channel)
            )
        )

    @nn.compact
    def __call__(self, x: Array, style: Array, noise: Optional[Array] = None) -> Array:
        conv = ModulatedConv2d(
            self.out_channel,
            self.kernel_size,
            demodulate=self.demodulate,
            upsample=self.upsample,
            blur_kernel=self.blur_kernel,
            quantized=self.quantized,
            name="conv",
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channel,))

        if self._fused_eligible(x):
            from synthesis_in_style_tpu.ops.pallas.fused_blur import (
                blur_demod_noise_bias_act,
            )

            out, demod = conv(x, style, fused_tail=True)
            b = x.shape[0]
            h = 2 * x.shape[1]
            plane = NoiseInjection(name="noise")(
                None, noise, plane_shape=(b, h, h), dtype=out.dtype
            )
            gain = 2.0  # per-axis sqrt(up_factor**2)
            taps = tuple(
                gain * float(t) / sum(self.blur_kernel) for t in self.blur_kernel
            )
            # nondiff args passed positionally (custom_jvp requirement)
            return blur_demod_noise_bias_act(
                out,
                demod,
                plane,
                bias.astype(out.dtype),
                taps,
                0.2,
                math.sqrt(2.0),
                jax.default_backend() != "tpu",
            )

        out = conv(x, style)
        out = NoiseInjection(name="noise")(out, noise)
        return fused_leaky_relu(out, bias.astype(out.dtype))


class ToRGB(nn.Module):
    """1x1 modulated conv to RGB with skip accumulation (reference ToRGB,
    model.py:345-364)."""

    upsample: bool = True
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    out_channels: int = 3

    @nn.compact
    def __call__(self, x: Array, style: Array, skip: Optional[Array] = None) -> Array:
        out = ModulatedConv2d(self.out_channels, 1, demodulate=False, name="conv")(
            x, style
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        out = out + bias.astype(out.dtype)
        if skip is not None:
            skip = upsample_2d(skip, make_kernel(list(self.blur_kernel)), 2)
            out = out + skip
        return out


def generator_channels(channel_multiplier: int = 2) -> Dict[int, int]:
    """Per-resolution channel widths (reference Generator.get_channels,
    model.py:443-455)."""
    return {
        4: 512,
        8: 512,
        16: 512,
        32: 512,
        64: 256 * channel_multiplier,
        128: 128 * channel_multiplier,
        256: 64 * channel_multiplier,
        512: 32 * channel_multiplier,
        1024: 16 * channel_multiplier,
    }


class Generator(nn.Module):
    """StyleGAN2 synthesis network (reference Generator, model.py:367-561).

    PRNG streams: "noise" (randomized per-layer noise), "mixing" (style-mixing
    inject index when not given explicitly).

    Setup-based so `__call__`, `style` and `mean_latent` share submodules.
    """

    size: int
    style_dim: int
    n_mlp: int
    channel_multiplier: int = 2
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    lr_mlp: float = 0.01
    # Run the upsample StyledConv tails as one fused Pallas pass
    # (ops/pallas/fused_blur.py). Bit-different only at bf16 rounding;
    # intended for TPU synthesis workloads (bench, dataset generation).
    fused_blur: bool = False
    # w8a8 dynamic-quantized StyledConv stack (ops/quant.py): int8 MXU
    # serving path, 1.2x end-to-end on v5e (MEASUREMENTS.md). ToRGB and
    # the style MLP stay bf16/f32 (FLOP-trivial; keeps the image
    # accumulation path full precision). Serving only — non-differentiable.
    quantized: bool = False

    @property
    def log_size(self) -> int:
        return int(math.log2(self.size))

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
        """Per-layer noise buffer shapes, NHWC (reference model.py:412-415)."""
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
        self.to_rgb1 = ToRGB(upsample=False)

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
                    fused_blur=self.fused_blur,
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
            to_rgbs.append(ToRGB())
        self.convs = convs
        self.to_rgbs = to_rgbs

        # default per-layer noise buffers (reference registers noise_{i}
        # buffers at construction, model.py:412-415); deterministic init so
        # fixed-noise synthesis is reproducible without rng plumbing
        self.noise_buffers = [
            self.variable(
                "noises",
                f"noise_{i}",
                lambda s=shp, i=i: jax.random.normal(jax.random.PRNGKey(i), s),
            )
            for i, shp in enumerate(self.noise_shapes())
        ]

    def style(self, z: Array) -> Array:
        """Map z -> w (reference get_latent, model.py:476-477)."""
        out = pixel_norm(z)
        for layer in self.style_layers:
            out = layer(out)
        return out

    def mean_latent(self, key: Array, n_latent: int) -> Array:
        """Average mapped latent for truncation (reference model.py:468-474).
        Call via .apply(vars, key, n, method=Generator.mean_latent)."""
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
        capture: Optional[Dict[str, Array]] = None,
    ) -> Tuple[Array, Any]:
        # `capture` is the bisect hook: per-stage outputs WITHOUT
        # stop_gradient, so grad-of-mean of one stage compiles to the exact
        # fwd+bwd prefix (scripts/gan_stage_bisect.py). The activation
        # protocol (`return_intermediate_activations`) stays stop-gradient —
        # the synthesis pipeline depends on that.
        if not input_is_latent:
            styles = [self.style(s) for s in styles]
        if capture is not None:
            capture["style_mlp"] = styles[0]

        if truncation < 1:
            assert truncation_latent is not None
            styles = [
                truncation_latent + truncation * (s - truncation_latent)
                for s in styles
            ]

        # --- build (B, n_latent, D) per-layer latents (style mixing) ---
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

        # --- noise buffers / streams ---
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
            acts[0] = lax.stop_gradient(out)

        out = self.conv1(out, latent[:, 0], noise=noise[0])
        if acts is not None:
            acts[1] = lax.stop_gradient(out)
        if capture is not None:
            capture["conv_1"] = out

        skip = self.to_rgb1(out, latent[:, 1])
        if capture is not None:
            capture["to_rgb_1"] = skip

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
                acts[i + 1] = lax.stop_gradient(out)
            if capture is not None:
                capture[f"conv_{i + 1}"] = out
            out = conv2(out, latent[:, i + 1], noise=noise2)
            if acts is not None:
                acts[i + 2] = lax.stop_gradient(out)
            if capture is not None:
                capture[f"conv_{i + 2}"] = out
            skip = to_rgb(out, latent[:, i + 2], skip)
            if capture is not None:
                capture[f"to_rgb_{i + 2}"] = skip
            i += 2

        image = skip

        if return_latents:
            return image, latent
        if return_intermediate_activations:
            return image, acts
        return image, None


class ConvLayer(nn.Module):
    """(optional blur-downsample) → EqualConv2d → fused LeakyReLU
    (reference ConvLayer, model.py:564-610)."""

    out_channel: int
    kernel_size: int
    downsample: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    use_bias: bool = True
    activate: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.downsample:
            p = (len(self.blur_kernel) - 2) + (self.kernel_size - 1)
            pad0 = (p + 1) // 2
            pad1 = p // 2
            x = blur_2d(x, make_kernel(list(self.blur_kernel)), (pad0, pad1))
            stride, padding = 2, 0
        else:
            stride, padding = 1, self.kernel_size // 2

        out = EqualConv2d(
            self.out_channel,
            self.kernel_size,
            stride=stride,
            padding=padding,
            use_bias=self.use_bias and not self.activate,
            name="conv",
        )(x)

        if self.activate:
            if self.use_bias:
                bias = self.param(
                    "bias", nn.initializers.zeros, (self.out_channel,)
                )
                out = fused_leaky_relu(out, bias.astype(out.dtype))
            else:
                out = scaled_leaky_relu(out)
        return out


class ResBlock(nn.Module):
    """Residual downsampling block with 1/sqrt(2) merge (reference ResBlock,
    model.py:613-631)."""

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
        skip = ConvLayer(
            self.out_channel, 1, downsample=True, use_bias=False, activate=False,
            name="skip",
        )(x)
        return (out + skip) / math.sqrt(2)


def minibatch_stddev(x: Array, group_size: int = 4, num_features: int = 1) -> Array:
    """Append a minibatch-stddev channel (reference Discriminator.forward,
    model.py:677-685). NHWC."""
    b, h, w, c = x.shape
    group = min(b, group_size)
    y = x.reshape(group, -1, h, w, num_features, c // num_features)
    y = y.astype(jnp.float32)
    var = jnp.var(y, axis=0)  # biased, matches torch unbiased=False
    std = jnp.sqrt(var + 1e-8)
    # mean over (channels-per-feature, H, W), keep per-feature stat
    mean_std = jnp.mean(std, axis=(1, 2, 4))  # (B//group, num_features)
    mean_std = jnp.tile(mean_std, (group, 1))  # (B, num_features)
    stat = jnp.broadcast_to(
        mean_std[:, None, None, :], (b, h, w, num_features)
    ).astype(x.dtype)
    return jnp.concatenate([x, stat], axis=-1)


class Discriminator(nn.Module):
    """StyleGAN2 discriminator (reference Discriminator, model.py:634-692)."""

    size: int
    channel_multiplier: int = 2
    blur_kernel: Sequence[int] = (1, 3, 3, 1)
    input_channels: int = 3

    @nn.compact
    def __call__(self, x: Array, capture: Optional[Dict[str, Array]] = None) -> Array:
        # `capture` records per-stage outputs WITHOUT stop_gradient (unlike
        # the generator's activation protocol) — the per-stage fwd+bwd
        # bisect jits grad-of-mean of one stage and lets XLA dead-code
        # eliminate the rest (scripts/gan_stage_bisect.py)
        channels = generator_channels(self.channel_multiplier)
        log_size = int(math.log2(self.size))

        out = ConvLayer(channels[self.size], 1, name="conv_in")(x)
        if capture is not None:
            capture["conv_in"] = out
        block = 0
        for i in range(log_size, 2, -1):
            out = ResBlock(
                channels[2 ** (i - 1)],
                blur_kernel=self.blur_kernel,
                name=f"blocks_{block}",
            )(out)
            if capture is not None:
                capture[f"block_{block}"] = out
            block += 1

        out = minibatch_stddev(out, group_size=4, num_features=1)
        out = ConvLayer(channels[4], 3, name="final_conv")(out)
        if capture is not None:
            capture["final_conv"] = out

        out = out.reshape(out.shape[0], -1)  # NHWC flatten (converter permutes)
        out = EqualLinear(channels[4], activation=True, name="final_linear_0")(out)
        out = EqualLinear(1, name="final_linear_1")(out)
        if capture is not None:
            capture["logits"] = out
        return out
