"""Pallas TPU kernel: FIR blur + demodulation + noise + bias + LeakyReLU.

The upsample StyledConv tail is, in reference order (networks/stylegan2/
model.py:182-342): transposed modulated conv -> Blur(4-tap FIR) ->
demodulate -> NoiseInjection -> bias -> scaled LeakyReLU. In XLA this costs
two full HBM round-trips of the generator's largest activations: the
depthwise blur conv pass, then the (noise+bias+act) elementwise pass.
gen_profile.py measured the blurs at 16.8% of the whole forward, running at
~66% of their own memory floor.

This kernel does the entire tail in ONE pass over VMEM tiles:

  out[n,y,x,c] = act( blur4(x)[n,y,x,c] * demod[n,c] + noise[n,y,x] + bias[c] )

Input convention — width-padded activations. Mosaic cannot slice HBM
memrefs whose second-to-last dim is not tile-aligned (the post-conv width
2w+1 is always odd), so the PRODUCER emits an aligned width instead: the
transposed conv adds one extra zero column on the left (which IS the blur's
left virtual pad) and zero columns on the right up to a multiple of 8
(covering the right pad). Those columns cost nothing — they fall in the
conv's zero-padding region, and XLA materializes conv outputs tile-padded
anyway. Logical layout of the kernel input:

  x[:, :, 0, :] == 0                      (left blur pad, real memory)
  x[:, :, 1 : 1+h_in, :]  == conv output  (h_in = 2h+1, odd)
  x[:, :, 1+h_in : w_pad, :] == 0         (right blur pad, >= 2 columns)

The height stays odd (rows are not a tiled dim): the top/bottom virtual
zero rows are two zeroed scratch rows around the DMA'd row window.

* Grid (B, H-tiles). x stays in HBM; each program DMAs a (TH+3)-row window
  (dynamic clamped start, static size). The (B, H, W) noise plane arrives
  as a regular float32 VMEM block: Mosaic lowers the lane-to-sublane
  `broadcast_in_dim` the epilogue needs for float32 (it rejects the same
  relayout in bfloat16, so the plane rides in f32 and is cast after).
* The 4x4 FIR kernel is rank-1 (outer(k1, k1)): a vertical 4-tap pass over
  the row window, then a horizontal 4-tap pass via static sublane slices.
* The epilogue (demod scale, noise plane, bias, LeakyReLU * sqrt(2)) runs
  on the still-resident tile.

Differentiation: custom_jvp whose rule computes BOTH primal and tangent in
plain XLA ops (the primal's blur is needed for the demod tangent anyway),
so the op is differentiable to any order — the path-length regularizer's
grad-of-grad works — while non-AD synthesis calls run the single-pass
Pallas kernel.

Capability parity: reference networks/stylegan2/op/upfirdn2d_kernel.cu +
fused_bias_act_kernel.cu, fused here with the demod/noise stages those CUDA
kernels could not see.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def padded_width(h_in: int) -> int:
    """Width the producer must emit for post-conv height h_in (odd):
    1 left pad + h_in + >=2 right pads, rounded up to the sublane tile."""
    return ((h_in + 3 + 7) // 8) * 8


def supported_shape(x_shape: Tuple[int, ...]) -> bool:
    """True if the fused kernel handles this padded activation shape.

    h_in >= 17 keeps the row tile a multiple of 8 (Mosaic's sublane rule);
    the excluded 9x9 layer carries trivial traffic and stays on XLA. The
    channel count must fill whole 128-lane tiles (generator widths always
    do; Mosaic rejects lane-unaligned HBM slices otherwise), and a tile
    height must evenly divide the output rows (the grid floor-divides, so
    a non-divisible height would silently drop trailing rows)."""
    _, h_in, w_pad, c = x_shape
    return (
        h_in % 2 == 1
        and h_in >= 17
        and w_pad == padded_width(h_in)
        and c % 128 == 0
        and _pick_tile(h_in - 1, c) is not None
    )


def _pick_tile(h_out: int, c: int) -> int:
    """Output-row tile height: <= h_out - 2 (the DMA window needs
    TH+3 <= H_in = h_out+1), divides h_out, and TH*C <= 2048 keeps the
    VMEM working set (double-buffered row windows + register-held tap
    accumulators, which live on the VMEM stack) under the 16 MB scoped
    limit. Tile size 16->128 measured within 3% of each other, so the
    smaller, always-safe tiles win."""
    for th in (32, 16, 8):
        if th * c <= 2048 and th <= h_out - 2 and h_out % th == 0:
            return th
    return None  # no evenly-dividing tile: shape unsupported


def _kernel(
    x_hbm,  # (B, H_in, W_pad, C) full ref, HBM (width-padded, see module doc)
    noise_ref,  # (1, TH, W) VMEM, float32 (bf16 lane->sublane broadcast is
    #             unsupported by Mosaic; f32 is)
    demod_ref,  # (1, 1, C) VMEM (demod passed (B, 1, C): Mosaic requires the
    #             block's second-to-last dim to divide by 8 or equal the
    #             array's, which the unit dim satisfies)
    bias_ref,  # (1, C) VMEM
    out_ref,  # (1, TH, W, C) VMEM
    xs,  # (2, TH+5, W_pad, C) VMEM scratch — double-buffered row windows
    sems,  # (2,) DMA semaphores, one per buffer slot
    *,
    th: int,
    h_in: int,
    w_out: int,
    c: int,
    n_tiles: int,
    n_batch: int,
    taps: Tuple[float, ...],
    slope: float,
    act_scale: float,
):
    n = pl.program_id(0)
    i = pl.program_id(1)
    g = n * n_tiles + i  # sequential step (TPU grids run in row-major order)

    def window_dma(step, slot):
        """Async copy of the row window for sequential step `step` into
        buffer `slot`. Row window [s, s+TH+3) covers every real row the
        tile's vertical taps touch; the clamp keeps the static-size DMA in
        bounds (`base` below re-aligns the tap slices after clamping)."""
        nn = step // n_tiles
        ii = step % n_tiles
        ss = jnp.clip(ii * th - 1, 0, h_in - (th + 3))
        return pltpu.make_async_copy(
            x_hbm.at[nn, pl.ds(ss, th + 3), :, :],
            xs.at[slot, pl.ds(1, th + 3)],
            sems.at[slot],
        )

    @pl.when(g == 0)
    def _warmup():
        # Virtual zero rows: scratch rows 0 and TH+4 stand in for image rows
        # -1 and H_in (only read by the clamped first/last tiles; the DMA
        # never overwrites them, so zeroing once per kernel launch suffices).
        xs[0, 0, :, :] = jnp.zeros_like(xs[0, 0])
        xs[0, th + 4, :, :] = jnp.zeros_like(xs[0, 0])
        xs[1, 0, :, :] = jnp.zeros_like(xs[0, 0])
        xs[1, th + 4, :, :] = jnp.zeros_like(xs[0, 0])
        window_dma(0, 0).start()

    # Prefetch the next step's window while this step computes (the noise
    # and output blocks are pipelined by pallas itself; only this manual
    # halo DMA needs explicit double buffering).
    @pl.when(g + 1 < n_batch * n_tiles)
    def _prefetch():
        window_dma(g + 1, (g + 1) % 2).start()

    slot = g % 2
    window_dma(g, slot).wait()
    s = jnp.clip(i * th - 1, 0, h_in - (th + 3))
    base = i * th - 1 - s

    # Vertical 4-tap pass, f32 accumulation (matching XLA's conv accumulator
    # precision; pure-bf16 MACs measured ~1e-2 relative error). The
    # left/right zero pads ride along as data. `vt` stays a register value —
    # materializing it through a VMEM scratch measured ~8% slower.
    vt = None
    for dy in range(4):
        t = jnp.asarray(taps[dy], jnp.float32)
        term = xs[slot, pl.ds(1 + base + dy, th), :, :].astype(jnp.float32) * t
        vt = term if vt is None else vt + term

    # Horizontal 4-tap pass: out col x needs padded cols x..x+3 (the input's
    # col 0 is the left zero pad, so real col x-1 lives at padded col x).
    out = None
    for dx in range(4):
        t = jnp.asarray(taps[dx], jnp.float32)
        term = vt[:, dx : dx + w_out, :] * t
        out = term if out is None else out + term

    # Epilogue (f32): demod, noise plane (lane->sublane broadcast), bias,
    # LeakyReLU*scale; single rounding to the output dtype at the end.
    out = out * demod_ref[0, 0, :][None, None, :].astype(jnp.float32)
    noise = jnp.squeeze(noise_ref[:], 0)  # (TH, W) f32
    out = out + jax.lax.broadcast_in_dim(noise, (th, w_out, c), (0, 1))
    out = out + bias_ref[0][None, None, :].astype(jnp.float32)
    out = jnp.where(out >= 0, out, out * jnp.float32(slope))
    out_ref[0] = (out * jnp.float32(act_scale)).astype(out_ref.dtype)


def _forward(x, demod, noise, bias, taps, slope, act_scale, interpret):
    b, h_in, w_pad, c = x.shape
    # Semantic requirements only; `supported_shape` adds the Mosaic lane/tile
    # constraints and is the dispatch gate for compiled TPU use (interpret
    # mode, used by CPU tests, accepts any channel count).
    assert h_in % 2 == 1 and h_in >= 17 and w_pad == padded_width(h_in), x.shape
    h_out = h_in - 1
    w_out = h_out
    th = _pick_tile(h_out, c)
    assert th is not None, (
        f"no tile height divides h_out={h_out} (the grid would silently "
        f"drop trailing rows) — gate callers on supported_shape()"
    )
    grid = (b, h_out // th)
    noise = noise.astype(jnp.float32)

    kernel = partial(
        _kernel,
        th=th,
        h_in=h_in,
        w_out=w_out,
        c=c,
        n_tiles=h_out // th,
        n_batch=b,
        # true convolution == correlation with the flipped taps (symmetric
        # for every StyleGAN2 blur, flipped anyway for generality)
        taps=tuple(float(t) for t in taps)[::-1],
        slope=float(slope),
        act_scale=float(act_scale),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h_out, w_out, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(
                (1, th, w_out), lambda n, i: (n, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, c), lambda n, i: (n, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, c), lambda n, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w_out, c),
            lambda n, i: (n, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, th + 5, w_pad, c), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x, noise, demod[:, None, :], bias[None, :])


def _unpad(x):
    """Strip the producer's width padding back to the logical (odd) width."""
    h_in = x.shape[1]
    return x[:, :, 1 : 1 + h_in, :]


@partial(jax.custom_jvp, nondiff_argnums=(4, 5, 6, 7))
def blur_demod_noise_bias_act(
    x: jnp.ndarray,  # (B, H+1, W_pad, C) width-padded post-conv activations
    demod: jnp.ndarray,  # (B, C) demodulation scales
    noise: jnp.ndarray,  # (B, H, W) noise plane, already scaled by its weight
    bias: jnp.ndarray,  # (C,)
    taps: Sequence[float] = (0.25, 0.75, 0.75, 0.25),
    slope: float = 0.2,
    act_scale: float = math.sqrt(2.0),
    interpret: bool = False,
) -> jnp.ndarray:
    """act(blur4(x) * demod + noise + bias), one fused pass.

    `taps` are the PER-AXIS separable taps including the per-axis upsample
    gain: for the StyleGAN2 (1,3,3,1) blur after an up-2 conv they are
    [1,3,3,1]/8 * 2 (outer-product sum == the reference's kernel*factor**2).
    The blur applies the standard upfirdn pad (1, 1) on each axis — the
    configuration ModulatedConv2d uses after its transposed conv. `x` must
    be width-padded per `padded_width` (see module docstring).
    """
    return _forward(x, demod, noise, bias, taps, slope, act_scale, interpret)


@blur_demod_noise_bias_act.defjvp
def _jvp_rule(taps, slope, act_scale, interpret, primals, tangents):
    """Primal AND tangent in plain XLA ops.

    Under AD the whole op becomes the XLA composition: the primal's blur is
    needed for the demod tangent anyway, so the fused Pallas kernel would
    save nothing here — and keeping pallas_call out of differentiated
    jaxprs makes the op differentiable to ANY order (the path-length
    regularizer's grad-of-grad re-differentiates this rule, which a
    custom_vjp — or a pallas primal left inside the first-grad jaxpr —
    would reject). Plain non-AD synthesis calls never enter this rule and
    run the single-pass Pallas kernel.
    """
    from synthesis_in_style_tpu.ops.upfirdn2d import upfirdn2d

    x, demod, noise, bias = primals
    dx, dd, dn, db = tangents

    k1 = jnp.asarray(taps, jnp.float32)
    k2d = k1[:, None] * k1[None, :]
    blur_x = upfirdn2d(_unpad(x), k2d, pad=(1, 1))
    blur_dx = upfirdn2d(_unpad(dx), k2d, pad=(1, 1))

    demod_b = demod[:, None, None, :].astype(blur_x.dtype)
    pre = blur_x * demod_b + noise[..., None].astype(blur_x.dtype) + bias.astype(
        blur_x.dtype
    )
    pos = pre.astype(jnp.float32) >= 0
    y = jnp.where(pos, pre, pre * jnp.asarray(slope, pre.dtype)) * jnp.asarray(
        act_scale, pre.dtype
    )

    pre_dot = (
        blur_dx * demod_b
        + blur_x * dd[:, None, None, :].astype(blur_x.dtype)
        + dn[..., None].astype(blur_x.dtype)
        + db.astype(blur_x.dtype)
    )
    act_grad = jnp.where(pos, act_scale, slope * act_scale).astype(y.dtype)
    return y.astype(x.dtype), (act_grad * pre_dot).astype(x.dtype)
