"""Pallas TPU kernel: fused bias + LeakyReLU + gain, with custom VJP.

TPU-native replacement for the reference CUDA kernel
(/root/reference/stylegan_code_finder/networks/stylegan2/op/fused_bias_act_kernel.cu):
one VMEM-resident elementwise pass on the VPU. The backward pass re-derives the
sign mask from the *output* (y >= 0 iff x + b >= 0 since scale > 0), exactly
like the reference reuses `out` as the gradient reference tensor
(op/fused_act.py:34-44), so no extra residual is stored.

Runs on TPU only; callers default to the XLA path (ops/fused_act.py) which is
equally fast when epilogue fusion applies — this kernel is the profiled
fallback and the template for further fusions.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _fwd_kernel(x_ref, b_ref, y_ref, *, slope, scale):
    x = x_ref[:] + b_ref[:]
    # Mosaic rejects bf16 vector compares on v5e ("Target does not support
    # this comparison") — compare in f32.
    mask = x.astype(jnp.float32) >= 0
    y_ref[:] = jnp.where(mask, x, x * slope) * scale


def _bwd_kernel(y_ref, g_ref, dx_ref, *, slope, scale):
    mask = y_ref[:].astype(jnp.float32) >= 0
    dx_ref[:] = jnp.where(mask, g_ref[:] * scale, g_ref[:] * (slope * scale))


def _flatten_rows(x: jnp.ndarray):
    """Collapse (..., C) to (R, C) rows for a 2-D VPU-friendly layout."""
    c = x.shape[-1]
    return x.reshape(-1, c), x.shape


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_leaky_relu_pallas(x, bias, negative_slope=0.2, scale=2**0.5):
    y, _ = _forward(x, bias, negative_slope, scale)
    return y


def _forward(x, bias, slope, scale):
    rows, orig_shape = _flatten_rows(x)
    r, c = rows.shape
    if bias is None:
        bias = jnp.zeros((c,), rows.dtype)
    b2d = jnp.broadcast_to(bias.astype(rows.dtype), (1, c))

    block_r = min(r, 512)
    grid = (pl.cdiv(r, block_r),)
    y = pl.pallas_call(
        partial(_fwd_kernel, slope=slope, scale=scale),
        out_shape=jax.ShapeDtypeStruct((r, c), rows.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_r, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_r, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(rows, b2d)
    return y.reshape(orig_shape), None


def _fwd_rule(x, bias, slope, scale):
    y, _ = _forward(x, bias, slope, scale)
    return y, (y, None if bias is None else bias.shape)


def _bwd_rule(slope, scale, residuals, g):
    y, bias_shape = residuals
    rows_y, orig_shape = _flatten_rows(y)
    rows_g, _ = _flatten_rows(g)
    r, c = rows_y.shape

    block_r = min(r, 512)
    grid = (pl.cdiv(r, block_r),)
    dx = pl.pallas_call(
        partial(_bwd_kernel, slope=slope, scale=scale),
        out_shape=jax.ShapeDtypeStruct((r, c), rows_g.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_r, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_r, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_r, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(rows_y, rows_g).reshape(orig_shape)

    if bias_shape is None:
        db = None
    else:
        db = dx.reshape(-1, dx.shape[-1]).sum(axis=0).reshape(bias_shape)
    return dx, db


fused_leaky_relu_pallas.defvjp(_fwd_rule, _bwd_rule)
