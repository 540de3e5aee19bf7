"""Mixed-precision helper shared by the updaters.

One documented predicate — *every floating-point leaf* — so sibling train
steps (stylegan2_updater, segmentation_updater) cannot drift apart in what
they cast. Integer/bool leaves (labels, step counters, PRNG keys) pass
through untouched.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def cast_floating(tree: Any, dtype) -> Any:
    """Cast every floating leaf of `tree` to `dtype`.

    `astype` is differentiable (its VJP casts back), so casting master
    float32 params to bfloat16 inside a loss function still yields float32
    gradients for the optimizer.
    """
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
        else a,
        tree,
    )
