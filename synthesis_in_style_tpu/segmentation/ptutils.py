"""Tensor utilities for the cluster-editing path (reference
segmentation/gan_local_edit/ptutils.py:25-97), NHWC/jax:

* `partial_flat` / `partial_unflat` — (N, H, W, C) <-> (N*H*W, C) (the
  reference permutes from NCHW; we are already channel-last).
* `MultiResolutionStore` — lazy cache of one feature map at multiple
  resolutions (bilinear or nearest), used when comparing cluster maps across
  layer resolutions.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def partial_flat(x: Array) -> Tuple[Array, Tuple[int, ...]]:
    """(N, H, W, C) -> ((N*H*W, C), original_shape)."""
    x = jnp.asarray(x)
    return x.reshape(-1, x.shape[-1]), x.shape


def partial_unflat(
    x: Array,
    original_shape: Optional[Tuple[int, ...]] = None,
    n: Optional[int] = None,
    h: Optional[int] = None,
    w: Optional[int] = None,
) -> Array:
    """(N*H*W, C) -> (N, H, W, C)."""
    assert x.ndim == 2
    c = x.shape[1]
    if original_shape is not None:
        n, h, w = original_shape[0], original_shape[1], original_shape[2]
    if w is None:
        w = h
    assert n is not None and h is not None and w is not None
    return x.reshape(n, h, w, c)


class MultiResolutionStore:
    """Lazy multi-resolution interpolation cache (reference :42-97)."""

    def __init__(self, item: Optional[Array] = None,
                 interpolation_mode: str = "bilinear"):
        self._data: Dict[int, Array] = {}
        self._res: Optional[int] = None
        if item is not None:
            item = jnp.asarray(item)
            self._res = int(item.shape[-2])  # NHWC spatial resolution
            self._data[self._res] = item
        self.interpolation_mode = interpolation_mode

    def get(self, res: Optional[int] = None, make: bool = True) -> Array:
        if res is None:
            res = self._res
        if res not in self and make:
            self.make(res)
        return self._data[res]

    def __getitem__(self, res: int) -> Array:
        return self.get(res, make=False)

    def __contains__(self, res: int) -> bool:
        return res in self._data

    def __len__(self) -> int:
        return len(self._data)

    def resolutions(self) -> Iterator[int]:
        return (res for res in self._data.keys())

    def __repr__(self) -> str:
        return "MultiResolutionStore {}: {}".format(
            self._data[self._res].shape, list(self.resolutions())
        )

    def make(self, res: int) -> None:
        self._data[res] = self._resize(res)

    def _resize(self, res: int) -> Array:
        assert isinstance(res, int)
        base = self._data[self._res]
        method = (
            "linear" if self.interpolation_mode == "bilinear"
            else self.interpolation_mode
        )
        return jax.image.resize(
            base, (base.shape[0], res, res, base.shape[-1]), method=method
        )
