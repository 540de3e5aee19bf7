"""upfirdn2d — fused upsample → FIR filter → downsample, TPU-native.

Capability parity with the reference CUDA kernel
(/root/reference/stylegan_code_finder/networks/stylegan2/op/upfirdn2d_kernel.cu and
op/upfirdn2d.py:144-187 `upfirdn2d_native`), re-designed for XLA:

The whole pipeline (zero-insertion upsample, edge pad/crop, 2-D FIR convolution,
strided downsample) is exactly one `lax.conv_general_dilated` call:

  * `lhs_dilation=(up, up)`      — zero-insertion upsampling
  * `padding=(pad0, pad1+up-1)`  — edge pad (negative = crop); the `up-1`
                                   correction accounts for the reference
                                   appending trailing zeros after the last
                                   sample while XLA interior dilation does not
  * flipped kernel + correlation — true convolution with the FIR kernel
  * `window_strides=(down,down)` — downsampling
  * `feature_group_count=C`      — depthwise (the FIR filter is per-channel)

Because it is a single native conv, XLA differentiates it (twice — needed for
R1 / path-length regularization) without any hand-written VJP: the reference's
`UpFirDn2dBackward` flip/swap identity (op/upfirdn2d.py:30-41) is exactly the
transpose-conv rule XLA already implements.

Layout is NHWC (TPU-preferred); the reference is NCHW.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Pad = Union[int, Tuple[int, int], Tuple[int, int, int, int]]


def make_kernel(k: Sequence[float]) -> jnp.ndarray:
    """Build a normalized 2-D FIR kernel from a 1-D or 2-D tap list.

    Mirrors reference `make_kernel` (stylegan2/model.py:23-31): outer product
    for 1-D input, then normalize to unit sum.
    """
    k = jnp.asarray(k, dtype=jnp.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    return k / jnp.sum(k)


def _normalize_pad(pad: Pad) -> Tuple[int, int, int, int]:
    """-> (pad_x0, pad_x1, pad_y0, pad_y1)."""
    if isinstance(pad, int):
        return pad, pad, pad, pad
    if len(pad) == 2:
        return pad[0], pad[1], pad[0], pad[1]
    return tuple(pad)  # type: ignore[return-value]


@partial(jax.jit, static_argnames=("up", "down", "pad"))
def upfirdn2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up: Union[int, Tuple[int, int]] = 1,
    down: Union[int, Tuple[int, int]] = 1,
    pad: Pad = (0, 0),
) -> jnp.ndarray:
    """Upsample, FIR-filter, downsample a NHWC batch in one fused conv.

    Args:
      x: (N, H, W, C) input.
      kernel: (kh, kw) FIR filter.
      up / down: integer factors (or (y, x) tuples).
      pad: (pad0, pad1) applied to both axes, or (x0, x1, y0, y1). Negative
        values crop.

    Returns:
      (N, (H*up_y + pad_y0 + pad_y1 - kh) // down_y + 1, ..., C)
    """
    up_y, up_x = (up, up) if isinstance(up, int) else up
    down_y, down_x = (down, down) if isinstance(down, int) else down
    pad_x0, pad_x1, pad_y0, pad_y1 = _normalize_pad(pad)

    n, h, w, c = x.shape
    kh, kw = kernel.shape

    # True convolution == correlation with the flipped kernel. Compute in the
    # input dtype (bfloat16 synthesis stays bfloat16 on the MXU); float32
    # inputs keep HIGHEST precision as before.
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    k = jnp.broadcast_to(k[:, :, None, None], (kh, kw, 1, c))

    out = lax.conv_general_dilated(
        x,
        k,
        window_strides=(down_y, down_x),
        padding=((pad_y0, pad_y1 + up_y - 1), (pad_x0, pad_x1 + up_x - 1)),
        lhs_dilation=(up_y, up_x),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=(
            lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
        ),
    )
    return out.astype(x.dtype)


def upsample_2d(x: jnp.ndarray, kernel: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """FIR upsample (reference `Upsample`, stylegan2/model.py:34-52).

    `kernel` must already be normalized (`make_kernel`); the factor**2 gain is
    applied here.
    """
    kh = kernel.shape[0]
    p = kh - factor
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2
    return upfirdn2d(x, kernel * (factor**2), up=factor, down=1, pad=(pad0, pad1))


def downsample_2d(x: jnp.ndarray, kernel: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """FIR downsample (reference `Downsample`, stylegan2/model.py:55-73)."""
    kh = kernel.shape[0]
    p = kh - factor
    pad0 = (p + 1) // 2
    pad1 = p // 2
    return upfirdn2d(x, kernel, up=1, down=factor, pad=(pad0, pad1))


def blur_2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    pad: Tuple[int, int],
    upsample_factor: int = 1,
) -> jnp.ndarray:
    """FIR blur (reference `Blur`, stylegan2/model.py:76-92)."""
    if upsample_factor > 1:
        kernel = kernel * (upsample_factor**2)
    return upfirdn2d(x, kernel, pad=pad)


def upfirdn2d_reference(
    x: np.ndarray,
    kernel: np.ndarray,
    up: Union[int, Tuple[int, int]] = 1,
    down: Union[int, Tuple[int, int]] = 1,
    pad: Pad = (0, 0),
) -> np.ndarray:
    """Slow numpy oracle implementing the documented upfirdn semantics
    (zero-insert → pad/crop → convolve → subsample). Used only by tests to
    golden-check the fused XLA implementation. NHWC layout.
    """
    up_y, up_x = (up, up) if isinstance(up, int) else up
    down_y, down_x = (down, down) if isinstance(down, int) else down
    pad_x0, pad_x1, pad_y0, pad_y1 = _normalize_pad(pad)

    n, h, w, c = x.shape
    kh, kw = kernel.shape

    # zero-insertion upsample: each sample followed by (up-1) zeros
    out = np.zeros((n, h * up_y, w * up_x, c), dtype=np.float64)
    out[:, ::up_y, ::up_x, :] = x

    # pad (clamped at 0) then crop (negative pads)
    out = np.pad(
        out,
        (
            (0, 0),
            (max(pad_y0, 0), max(pad_y1, 0)),
            (max(pad_x0, 0), max(pad_x1, 0)),
            (0, 0),
        ),
    )
    out = out[
        :,
        max(-pad_y0, 0) : out.shape[1] - max(-pad_y1, 0),
        max(-pad_x0, 0) : out.shape[2] - max(-pad_x1, 0),
        :,
    ]

    # true 2-D convolution, valid region
    oh = out.shape[1] - kh + 1
    ow = out.shape[2] - kw + 1
    res = np.zeros((n, oh, ow, c), dtype=np.float64)
    kflip = kernel[::-1, ::-1]
    for dy in range(kh):
        for dx in range(kw):
            res += kflip[dy, dx] * out[:, dy : dy + oh, dx : dx + ow, :]

    return res[:, ::down_y, ::down_x, :].astype(x.dtype)
