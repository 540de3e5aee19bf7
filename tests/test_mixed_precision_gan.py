"""Mixed-precision GAN training: bf16 compute with f32 master params
(updaters/stylegan2_updater.py compute_dtype)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np
import optax

from synthesis_in_style_tpu.models.stylegan2 import Discriminator, Generator
from synthesis_in_style_tpu.updaters.stylegan2_updater import (

    StyleGAN2Config,
    create_gan_train_state,
    make_train_steps,
)

pytestmark = pytest.mark.slow  # excluded from the quick lane (-m 'not slow')



def test_bf16_gan_steps_keep_f32_masters():
    size = 16
    gen = Generator(size=size, style_dim=32, n_mlp=2, channel_multiplier=1)
    disc = Discriminator(size=size, channel_multiplier=1)
    g_tx = optax.adam(2e-3)
    d_tx = optax.adam(2e-3)
    state = create_gan_train_state(
        gen, disc, jax.random.PRNGKey(0), size, g_tx, d_tx
    )
    cfg = StyleGAN2Config(compute_dtype="bfloat16", d_reg_every=2, g_reg_every=2)
    steps = make_train_steps(gen, disc, g_tx, d_tx, cfg, batch_size=4,
                             donate=False)

    real = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, size, size, 3)).astype("f4")
    )
    state, d_metrics = steps["d_step"](state, real, jax.random.PRNGKey(1))
    state, r1 = steps["d_reg_step"](state, real)
    state, g_metrics = steps["g_step"](state, jax.random.PRNGKey(2))
    state, pl = steps["g_reg_step"](state, jax.random.PRNGKey(3))

    for m in (d_metrics, r1, g_metrics, pl):
        for k, v in m.items():
            assert np.isfinite(float(v)), k

    # master params and EMA stay float32
    for leaf in jax.tree_util.tree_leaves(state.g_params) + jax.tree_util.tree_leaves(
        state.d_params
    ) + jax.tree_util.tree_leaves(state.g_ema):
        assert leaf.dtype == jnp.float32, leaf.dtype

    # a few steps keep losses finite (stability smoke)
    for i in range(3):
        state, d_metrics = steps["d_step"](state, real, jax.random.fold_in(jax.random.PRNGKey(4), i))
        state, g_metrics = steps["g_step"](state, jax.random.fold_in(jax.random.PRNGKey(5), i))
    assert np.isfinite(float(d_metrics["discriminator_loss"]))
    assert np.isfinite(float(g_metrics["generator_loss"]))
