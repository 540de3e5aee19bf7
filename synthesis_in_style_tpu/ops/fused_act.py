"""Fused bias-add + LeakyReLU(0.2) + sqrt(2) gain.

Capability parity with the reference CUDA kernel
(/root/reference/stylegan_code_finder/networks/stylegan2/op/fused_bias_act_kernel.cu
and op/fused_act.py:19-86). On TPU this is a pure elementwise chain that XLA
fuses into the producing matmul/conv epilogue on its own — no custom kernel is
needed for performance, and JAX differentiates it (twice, for R1/path-length
regularization) automatically.

A Pallas TPU kernel implementing the same fusion lives in
`synthesis_in_style_tpu.ops.pallas.fused_bias_act`; it exists to keep the hot
path under our control when profiling shows the XLA epilogue fusion breaks
(e.g. across pjit boundaries), and is selectable via `impl="pallas"`.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_SQRT2 = math.sqrt(2.0)


def fused_leaky_relu(
    x: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    negative_slope: float = 0.2,
    scale: float = _SQRT2,
    impl: str = "xla",
) -> jnp.ndarray:
    """y = leaky_relu(x + bias) * scale, bias broadcast over the channel axis.

    Channel axis is the last axis (NHWC / (..., C)); the reference broadcasts
    over dim 1 of NCHW (op/fused_act.py:85-86).
    """
    if impl == "pallas":
        from synthesis_in_style_tpu.ops.pallas.fused_bias_act import (
            fused_leaky_relu_pallas,
        )

        return fused_leaky_relu_pallas(x, bias, negative_slope, scale)

    if bias is not None:
        x = x + bias
    return jnp.where(x >= 0, x, x * negative_slope) * scale


def scaled_leaky_relu(x: jnp.ndarray, negative_slope: float = 0.2) -> jnp.ndarray:
    """LeakyReLU * sqrt(2) without bias (reference ScaledLeakyReLU,
    stylegan2/model.py:170-179)."""
    return jnp.where(x >= 0, x, x * negative_slope) * _SQRT2
