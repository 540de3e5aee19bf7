"""Learning-rate schedules as optax-compatible functions.

Replicates reference scheduling: `ClampedCosineAnnealingLR` (holds eta_min
after T_max — utils/clamped_cosine.py:8-19), cosine warm restarts
(train.py:39-56), and plain cosine for GAN training
(train_stylegan_2.py:173-178)."""

from __future__ import annotations

import math

import jax.numpy as jnp


def clamped_cosine(base_lr: float, t_max: int, eta_min: float = 0.0):
    """Cosine anneal to eta_min over t_max steps, then hold eta_min."""

    def schedule(step):
        step = jnp.asarray(step)
        t = jnp.minimum(step, t_max)
        cos = 0.5 * (1 + jnp.cos(jnp.pi * t / t_max))
        return eta_min + (base_lr - eta_min) * cos

    return schedule


def cosine_warm_restarts(base_lr: float, t_0: int, t_mult: int = 1, eta_min: float = 0.0):
    """SGDR-style warm restarts (torch CosineAnnealingWarmRestarts parity)."""
    if t_mult == 1:

        def schedule(step):
            t = jnp.mod(jnp.asarray(step), t_0)
            return eta_min + (base_lr - eta_min) * 0.5 * (1 + jnp.cos(jnp.pi * t / t_0))

        return schedule

    # t_mult > 1: cycle i has length t_0 * t_mult**i. Closed form via logs.
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        n = jnp.floor(
            jnp.log(step / t_0 * (t_mult - 1) + 1) / math.log(t_mult)
        )
        cycle_start = t_0 * (jnp.power(float(t_mult), n) - 1) / (t_mult - 1)
        cycle_len = t_0 * jnp.power(float(t_mult), n)
        t = (step - cycle_start) / cycle_len
        return eta_min + (base_lr - eta_min) * 0.5 * (1 + jnp.cos(jnp.pi * t))

    return schedule


def constant(base_lr: float):
    def schedule(step):
        return jnp.full_like(jnp.asarray(step, jnp.float32), base_lr)

    return schedule
