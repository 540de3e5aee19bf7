"""Pallas TPU kernel: one-pass connected-components label sweep.

The XLA device-CC path (segmentation/device_cc.py) converges in ~30 sweeps
at 256px, and each sweep costs 4 `lax.associative_scan`s (2 axes x 2
directions) of ~8 HBM passes each — ~32 full-array HBM round-trips per
sweep, measured bandwidth-bound (MEASUREMENTS.md round-4 cost accounting,
45.9 ms/img device-contour compute). This kernel holds the whole (H, W)
label image in VMEM and runs the ENTIRE sweep — optional 8-connectivity
diagonal bridge, column propagation, row propagation, both directions, and
several sweeps back-to-back — between ONE HBM read and ONE HBM write:

  HBM traffic per call: read labels+mask once, write labels + a per-image
  changed flag once, regardless of `sweeps` and of the log2(W)+log2(H)
  in-register Hillis-Steele steps per propagation.

The segmented-min scan operator matches device_cc._segmented_min_scan:
combine((m1,r1),(m2,r2)) = (m2 if r2 else min(m1,m2), r1|r2), identity
(INF, False). Hillis-Steele needs associativity only, so the in-register
scan computes the identical fixpoint labels as the XLA path (equality
pinned in tests/test_device_cc.py).

Shape support: H multiple of 8, W multiple of 128 (Mosaic tile rules), and
(H, W) int32 working set small enough for VMEM (~6 live arrays — 512x512
comfortably fits). Callers fall back to the XLA path otherwise.

Replaces the host-side mechanism of reference
base_cluster_based_dataset_segmenter.py:148-450 (cv2.findContours) on the
no-host-scaling path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_INF = jnp.iinfo(jnp.int32).max


def _shift(x, d: int, axis: int, fill):
    """Shift by d along axis (positive = toward higher indices), filling
    vacated slots with `fill` — jnp.roll (tpu.rotate) + iota mask, the
    Mosaic-friendly lowering."""
    size = x.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=axis)
    rolled = jnp.roll(x, d, axis=axis)
    if d >= 0:
        return jnp.where(idx >= d, rolled, fill)
    return jnp.where(idx < size + d, rolled, fill)


def _segment_reach(resets, axis: int, forward: bool):
    """Precomputed per-position scan-reach: how far back (forward=True) or
    ahead a min-scan may pull values without crossing a reset. The
    label-independent part of the segmented scan, computed ONCE per kernel
    call (resets never change) and reused by every sweep/direction step:
    the step-d update is then a single compare `reach > d` instead of
    maintaining a running reset-flag scan.

    reach_i = i - last_reset_at_or_before(i)  (forward), mirrored backward;
    a reset position gets reach 0, so it never imports a neighbor."""
    size = resets.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, resets.shape, dimension=axis)
    if forward:
        last = jnp.where(resets > 0, idx, -1)
        d = 1
        while d < size:
            last = jnp.maximum(last, _shift(last, d, axis, -1))
            d *= 2
        return idx - last
    nxt = jnp.where(resets > 0, idx, size)
    d = 1
    while d < size:
        nxt = jnp.minimum(nxt, _shift(nxt, -d, axis, size))
        d *= 2
    return nxt - idx


def _prop_axis(m, reach_fwd, reach_bwd, axis: int):
    """Bidirectional segmented-min propagation along one axis, in VMEM.
    Sequential fwd-then-bwd composition: for a min-scan both orders yield
    the full run minimum everywhere — identical to min(fwd(m), bwd(m))."""
    size = m.shape[axis]
    d = 1
    while d < size:
        m = jnp.where(
            reach_fwd > d, jnp.minimum(m, _shift(m, d, axis, _INF)), m
        )
        d *= 2
    d = 1
    while d < size:
        m = jnp.where(
            reach_bwd > d, jnp.minimum(m, _shift(m, -d, axis, _INF)), m
        )
        d *= 2
    return m


def _neighbor_min_3x3(m):
    """Min over the 3x3 window (self included), INF beyond the border —
    separable: 3-tap min along lanes, then along sublanes."""
    h = jnp.minimum(m, jnp.minimum(_shift(m, 1, 1, _INF),
                                   _shift(m, -1, 1, _INF)))
    return jnp.minimum(h, jnp.minimum(_shift(h, 1, 0, _INF),
                                      _shift(h, -1, 0, _INF)))


def _sweep_kernel(labels_ref, mask_ref, out_ref, changed_ref, *,
                  connectivity: int, sweeps: int):
    m = labels_ref[0]
    mask = mask_ref[0]
    resets = 1 - mask
    reach = [
        (_segment_reach(resets, axis, True),
         _segment_reach(resets, axis, False))
        for axis in (0, 1)
    ]
    orig = m
    for _ in range(sweeps):
        if connectivity == 8:
            m = jnp.where(
                mask > 0, jnp.minimum(m, _neighbor_min_3x3(m)), _INF
            )
        m = _prop_axis(m, *reach[0], axis=0)
        m = _prop_axis(m, *reach[1], axis=1)
    out_ref[0] = m
    # lane-aligned (8, 128) flag tile: Mosaic rejects sub-tile blocks
    changed_ref[0] = jnp.full(
        (8, 128), jnp.any(m != orig).astype(jnp.int32)
    )


def supported_shape(h: int, w: int) -> bool:
    """VMEM-resident sweep needs tile-aligned dims and a bounded working
    set (~6 live (H, W) int32 arrays)."""
    return h % 8 == 0 and w % 128 == 0 and h * w * 4 * 6 <= 12 * 2**20


@partial(jax.jit, static_argnames=("connectivity", "sweeps", "interpret"))
def cc_sweeps(labels, mask, connectivity: int = 4, sweeps: int = 4,
              interpret: bool = False):
    """Run `sweeps` full label-propagation sweeps over a batch of images.

    Args:
      labels: (B, H, W) int32, INF at background.
      mask: (B, H, W) int32/bool foreground mask.
      connectivity: 4 or 8 (matches device_cc.connected_components).
      interpret: Pallas interpret mode (CPU tests).

    Returns:
      (new_labels (B, H, W) int32, changed (B,) int32).
    """
    b, h, w = labels.shape
    mask = mask.astype(jnp.int32)
    kernel = partial(_sweep_kernel, connectivity=connectivity, sweeps=sweeps)
    new, changed = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w), jnp.int32),
            jax.ShapeDtypeStruct((b, 8, 128), jnp.int32),
        ],
        interpret=interpret,
    )(labels, mask)
    return new, changed[:, 0, 0]
