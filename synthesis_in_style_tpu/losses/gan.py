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


def r1_update(disc_apply, d_tx, r1_weight, interval, d_params, d_opt, real):
    """One lazy-R1 discriminator update, shared by every GAN-style updater
    (reference stylegan_2_updater.py:144-156 and its copies in
    adversarial_updater.py / autoencoder_discriminator_updater.py).

    penalty = r1_weight/2 * E[||∇_x D(x)||²] * interval — the interval
    factor is the reference's lazy-regularization weight folding (:152).
    `disc_apply(params, x) -> logits`. Returns (d_params, d_opt, penalty, r1).
    """
    import optax

    def loss_fn(p):
        grad_x = jax.grad(lambda x: jnp.sum(disc_apply(p, x)))(real)
        r1 = jnp.mean(jnp.sum(jnp.square(grad_x), axis=(1, 2, 3)))
        return r1_weight / 2.0 * r1 * interval, r1

    (penalty, r1), grads = jax.value_and_grad(loss_fn, has_aux=True)(d_params)
    updates, d_opt = d_tx.update(grads, d_opt, d_params)
    return optax.apply_updates(d_params, updates), d_opt, penalty, r1
