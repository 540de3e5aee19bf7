"""Dynamic w8a8 quantization for the synthesis (serving) path.

The TPU MXU runs int8 x int8 -> int32 at twice the bf16 peak (v5e: ~394
TOPS vs 197 TFLOP/s). The StyleGAN2/SWAGAN generator forward is
compute-bound at ~67% MFU in bf16 (MEASUREMENTS.md), so the 3x3 modulated
convs — where all the FLOPs are — gain ~1.7-1.9x from the int8 path
(measured per-shape on v5e: 64x64x512->512 294 vs 171 T/s, 128x128x256
289 vs 150, 256x256x128 290 vs 170).

Scheme (serving-only, not differentiable through the rounding):
* weights: per-output-channel symmetric int8, quantized from the f32
  master at trace time (folds into the executable as a constant when the
  params are donated/frozen);
* activations: dynamic per-sample symmetric int8 (abs-max over H,W,C of
  each sample) — valid because conv never mixes samples, so the
  per-sample scale factors out of the convolution exactly;
* accumulation in int32, dequantized to the activation dtype with the
  product of the two scales.

The reference has no quantized path (CUDA fp16/fp32 only,
/root/reference/stylegan_code_finder/networks/stylegan2/op/); this is a
beyond-parity serving mode, opt-in via ``Generator(quantized=True)`` /
``quantize: true`` in synthesis configs. Demodulation statistics stay
f32 from the unquantized weights, so only the conv itself sees int8.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

_QMAX = 127.0


def quantize_per_sample(x: Array, eps: float = 1e-12) -> Tuple[Array, Array]:
    """Symmetric int8 quantization with one dynamic scale per sample.

    Returns ``(x_q int8 (B,H,W,C), scale f32 (B,))`` with
    ``x ~= x_q * scale[:, None, None, None]``.
    """
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=(1, 2, 3))
    scale = jnp.maximum(amax, eps) / _QMAX
    xq = jnp.clip(
        jnp.round(xf / scale[:, None, None, None]), -_QMAX, _QMAX
    ).astype(jnp.int8)
    return xq, scale


def quantize_per_out_channel(w: Array, eps: float = 1e-12) -> Tuple[Array, Array]:
    """Symmetric int8 weight quantization, one scale per output channel.

    ``w`` is HWIO; returns ``(w_q int8, scale f32 (O,))`` with
    ``w ~= w_q * scale``.
    """
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=(0, 1, 2))
    scale = jnp.maximum(amax, eps) / _QMAX
    wq = jnp.clip(jnp.round(wf / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return wq, scale


def int8_conv(
    x_q: Array,
    w_q: Array,
    stride: int = 1,
    padding=0,
    lhs_dilation: Optional[Tuple[int, int]] = None,
    rhs_dilation: Optional[Tuple[int, int]] = None,
) -> Array:
    """int8 x int8 -> int32 NHWC conv (zero pad / zero insertion are exact
    in the symmetric scheme since the zero point is 0)."""
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return lax.conv_general_dilated(
        x_q,
        w_q,
        window_strides=(stride, stride),
        padding=padding,
        lhs_dilation=lhs_dilation,
        rhs_dilation=rhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def conv2d_w8a8(
    x: Array,
    w: Array,
    stride: int = 1,
    padding=0,
    lhs_dilation: Optional[Tuple[int, int]] = None,
) -> Array:
    """Quantize -> int8 conv -> dequantize; drop-in for the f32/bf16 conv.

    Output dtype follows ``x``. Non-differentiable (rounding); serving only.
    """
    xq, sx = quantize_per_sample(x)
    wq, sw = quantize_per_out_channel(w)
    out = int8_conv(xq, wq, stride=stride, padding=padding, lhs_dilation=lhs_dilation)
    scale = sx[:, None, None, None] * sw[None, None, None, :]
    return (out.astype(jnp.float32) * scale).astype(x.dtype)


# ---------------------------------------------------------------------------
# Static post-training quantization (PTQ) helpers — int8 tensors FLOW between
# layers instead of being re-quantized per op. For memory-bound serving
# models (DocUFCN runs at ~91% of the HBM roofline, MEASUREMENTS.md) the win
# is bandwidth, not MXU rate: with static output scales the requantize step
# is a pure elementwise epilogue XLA fuses into the producing conv, so only
# int8 ever crosses HBM between layers — half the bf16 traffic. Dynamic
# quantization cannot do this: its per-sample abs-max is a reduction over
# the producer's output, forcing an extra full read+write pass, which on a
# bandwidth-bound model costs more than the int8 read saves.
# ---------------------------------------------------------------------------


def scale_from_amax(amax: Array, eps: float = 1e-12) -> Array:
    """Calibrated abs-max -> symmetric int8 scale (zero-safe)."""
    return jnp.maximum(jnp.asarray(amax, jnp.float32), eps) / _QMAX


def quantize_weight_folded(
    w: Array, s_in: Array, eps: float = 1e-12
) -> Tuple[Array, Array]:
    """Fold per-input-channel activation scales into the weight, then
    quantize per output channel.

    With ``x_float ~= x_q * s_in[c]`` (static per-channel scales), folding
    ``s_in`` into the float weight BEFORE quantization makes
    ``conv(x_q, w_q) * s_w`` approximate ``conv(x_float, w)`` exactly as
    well as unfolded quantization — at zero runtime cost, and it lets
    concatenated inputs with different scales (decoder skip-concats) feed
    ONE int8 conv instead of per-segment partial convs.

    ``w`` is HWIO; ``s_in`` is (I,) or scalar. Returns ``(w_q int8,
    s_w f32 (O,))``.
    """
    wf = w.astype(jnp.float32) * jnp.reshape(s_in, (1, 1, -1, 1))
    return quantize_per_out_channel(wf, eps)


def requantize(y: Array, s_out: Array) -> Array:
    """f32/bf16 activation -> int8 with a static (per-channel or scalar)
    output scale. Pure elementwise — fuses into the producer's epilogue."""
    q = jnp.round(y.astype(jnp.float32) / s_out)
    return jnp.clip(q, -_QMAX, _QMAX).astype(jnp.int8)


def _parity_compose(ee: Array, eo: Array, oe: Array, oo: Array) -> Array:
    """Scatter the four parity planes onto the (2H+1, 2W+1) output grid via
    interior-padded `lax.pad` (the native dilation primitive — no
    stack/reshape/slice relayouts, which measured 2x slower end-to-end) and
    sum; the non-zero positions are disjoint."""

    def place(t, odd_h, odd_w):
        zero = jnp.zeros((), t.dtype)
        cfg = [
            (0, 0, 0),
            (odd_h, odd_h, 1),
            (odd_w, odd_w, 1),
            (0, 0, 0),
        ]
        return lax.pad(t, zero, cfg)

    return (
        place(ee, 0, 0)
        + place(eo, 0, 1)
        + place(oe, 1, 0)
        + place(oo, 1, 1)
    )


def conv2d_w8a8_up2(x: Array, w: Array) -> Array:
    """Quantized 2x transposed conv (k=3): parity-decomposed into four plain
    int8 convs + parity recompose.

    Bit-identical to ``conv2d_w8a8(x, w, padding=2, lhs_dilation=(2, 2))``
    (same int8 operands -> the four sub-convs compute exactly the non-zero
    terms of the zero-inserted conv, int32-exact). The MXU int8 path gives
    no speedup on lhs-dilated convs (measured 2.44 vs 2.49 ms at
    32x32x512->512 b64 on v5e) while plain int8 convs hit ~290 TOP/s, so
    this computes only the useful quarter of the zero-inserted FLOPs at
    full int8 rate — but the recompose cost dominates on TPU.

    **Measured negative result, kept for the record, NOT routed by the
    generator**: stack/reshape/slice interleave regressed the end-to-end
    w8a8 bench 1702 -> 876 img/s (full-tensor relayout copies per upsample
    layer); the interior-`lax.pad` + add formulation below blew up XLA
    compile (>20 min vs ~3 min, never completed). The production quantized
    generator leaves upsample convs in bf16 instead
    (models/stylegan2.py ModulatedConv2d._mod_conv).

    ``w`` is HWIO with kh == kw == 3, already kernel-flipped by the caller
    (same contract as the dense upsample path in ModulatedConv2d).

    Derivation: with zero-inserted input z (z[2i] = x[i]) padded by 2, output
    parity (p mod 2, q mod 2) selects fixed kernel taps:
      (even, even) -> w[0::2, 0::2] (2x2) over x padded (1, 1)
      (even, odd)  -> w[0::2, 1:2] (2x1) over x padded ((1, 1), (0, 0))
      (odd, even)  -> w[1:2, 0::2] (1x2) over x padded ((0, 0), (1, 1))
      (odd, odd)   -> w[1:2, 1:2] (1x1), no padding
    """
    assert w.shape[0] == 3 and w.shape[1] == 3, w.shape
    xq, sx = quantize_per_sample(x)
    wq, sw = quantize_per_out_channel(w)
    scale = sx[:, None, None, None] * sw[None, None, None, :]

    def sub(kern, pad_h, pad_w):
        out = int8_conv(xq, kern, padding=(pad_h, pad_w))
        return (out.astype(jnp.float32) * scale).astype(x.dtype)

    ee = sub(wq[0::2, 0::2], (1, 1), (1, 1))  # (B, H+1, W+1, O)
    eo = sub(wq[0::2, 1:2], (1, 1), (0, 0))  # (B, H+1, W,   O)
    oe = sub(wq[1:2, 0::2], (0, 0), (1, 1))  # (B, H,   W+1, O)
    oo = sub(wq[1:2, 1:2], (0, 0), (0, 0))  # (B, H,   W,   O)

    return _parity_compose(ee, eo, oe, oo)  # (B, 2H+1, 2W+1, O)
