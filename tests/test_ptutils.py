"""ptutils parity: partial flat/unflat roundtrip, MultiResolutionStore lazy
cache (reference segmentation/gan_local_edit/ptutils.py:25-97)."""

import jax
import numpy as np

from synthesis_in_style_tpu.segmentation.ptutils import (
    MultiResolutionStore,
    partial_flat,
    partial_unflat,
)


def test_partial_flat_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 6, 3))
    flat, shape = partial_flat(x)
    assert flat.shape == (2 * 4 * 6, 3)
    back = partial_unflat(flat, original_shape=shape)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_multi_resolution_store():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 2))
    store = MultiResolutionStore(x)
    assert 8 in store and len(store) == 1
    y = store.get(16)
    assert y.shape == (1, 16, 16, 2)
    assert 16 in store and len(store) == 2
    # cached: same object on second access
    assert store.get(16) is y
    assert list(store.resolutions()) == [8, 16]
    np.testing.assert_array_equal(np.asarray(store[8]), np.asarray(x))
    nearest = MultiResolutionStore(x, interpolation_mode="nearest")
    assert nearest.get(4).shape == (1, 4, 4, 2)
