"""Non-saturating logistic GAN losses (reference stylegan_2_updater.py:84-101)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def d_logistic_loss(real_pred: jax.Array, fake_pred: jax.Array) -> jax.Array:
    """softplus(-D(x)) + softplus(D(G(z)))."""
    return jnp.mean(jax.nn.softplus(-real_pred)) + jnp.mean(
        jax.nn.softplus(fake_pred)
    )


def g_nonsaturating_loss(fake_pred: jax.Array) -> jax.Array:
    """softplus(-D(G(z)))."""
    return jnp.mean(jax.nn.softplus(-fake_pred))
