"""GAN training-step tests: all four jitted steps run, losses are finite,
params actually move, EMA tracks, and the whole thing works data-parallel on
the 8-device CPU mesh (something the reference never tested, SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from synthesis_in_style_tpu.models.stylegan2 import Discriminator, Generator
from synthesis_in_style_tpu.parallel import make_mesh, replicate, shard_batch
from synthesis_in_style_tpu.updaters.stylegan2_updater import (

    GANTrainState,
    StyleGAN2Config,
    StyleGAN2Updater,
    create_gan_train_state,
    make_train_steps,
)

pytestmark = pytest.mark.slow  # excluded from the quick lane (-m 'not slow')


SIZE = 16
BATCH = 8


@pytest.fixture(scope="module")
def setup():
    gen = Generator(size=SIZE, style_dim=32, n_mlp=2)
    disc = Discriminator(size=SIZE)
    g_tx = optax.adam(2e-3, b1=0.0, b2=0.99)
    d_tx = optax.adam(2e-3, b1=0.0, b2=0.99)
    state = create_gan_train_state(
        gen, disc, jax.random.PRNGKey(0), SIZE, g_tx, d_tx
    )
    cfg = StyleGAN2Config()
    steps = make_train_steps(gen, disc, g_tx, d_tx, cfg, BATCH, donate=False)
    return gen, disc, g_tx, d_tx, state, steps


def _real_batch(key):
    return jax.random.normal(key, (BATCH, SIZE, SIZE, 3))


def test_d_step(setup):
    *_, state, steps = setup
    real = _real_batch(jax.random.PRNGKey(1))
    new_state, m = steps["d_step"](state, real, jax.random.PRNGKey(2))
    assert np.isfinite(float(m["discriminator_loss"]))
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.d_params, new_state.d_params
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0
    # G untouched by D step
    same = jax.tree_util.tree_map(
        lambda a, b: bool(jnp.all(a == b)), state.g_params, new_state.g_params
    )
    assert all(jax.tree_util.tree_leaves(same))


def test_d_reg_step_r1(setup):
    *_, state, steps = setup
    real = _real_batch(jax.random.PRNGKey(1))
    new_state, m = steps["d_reg_step"](state, real)
    assert np.isfinite(float(m["r1_penalty"]))
    assert float(m["r1_penalty"]) > 0


def test_g_step_and_ema(setup):
    *_, state, steps = setup
    new_state, m = steps["g_step"](state, jax.random.PRNGKey(3))
    assert np.isfinite(float(m["generator_loss"]))
    assert int(new_state.step) == int(state.step) + 1
    # EMA blend: after ema_step, the EMA pulls toward the new params but not
    # onto them (decay in (0, 1)). Per-leaf we allow <= — the style layers
    # store weights at ~100x scale (equalized lr), where one EMA step's
    # shift is below f32 resolution — but the TOTAL distance must strictly
    # shrink and never reach zero.
    ema_state, _ = steps["ema_step"](new_state)
    total_before = total_after = 0.0
    for e0, e1, p in zip(
        jax.tree_util.tree_leaves(new_state.g_ema),
        jax.tree_util.tree_leaves(ema_state.g_ema),
        jax.tree_util.tree_leaves(new_state.g_params),
    ):
        before = float(jnp.sum(jnp.abs(e0 - p)))
        after = float(jnp.sum(jnp.abs(e1 - p)))
        assert after <= before
        total_before += before
        total_after += after
    assert 0 < total_after < total_before


def test_g_reg_step_path_length(setup):
    *_, state, steps = setup
    new_state, m = steps["g_reg_step"](state, jax.random.PRNGKey(4))
    assert np.isfinite(float(m["path_loss"]))
    assert float(m["mean_path_length"]) != 0.0


def test_full_updater_loop(setup):
    gen, disc, g_tx, d_tx, state, _ = setup

    class FakeLoader:
        epoch = 0

        def __iter__(self):
            return self

        def __next__(self):
            return np.random.RandomState(0).randn(BATCH, SIZE, SIZE, 3).astype("f4")

    # the updater's steps donate their input state — give it a private copy
    state_copy = jax.tree_util.tree_map(jnp.copy, state)
    updater = StyleGAN2Updater(
        gen, disc, g_tx, d_tx, state_copy,
        iterators={"images": FakeLoader()},
        batch_size=BATCH,
        cfg=StyleGAN2Config(d_reg_every=2, g_reg_every=2),
    )
    for _ in range(4):
        updater.update()
    assert updater.iteration == 4
    assert np.isfinite(float(updater.state.mean_path_length))


def test_data_parallel_gan_step(setup, eight_devices):
    """Full D+G step with state replicated and batch sharded over 8 devices."""
    gen, disc, g_tx, d_tx, state, steps = setup
    mesh = make_mesh(8)
    state_r = replicate(mesh, state)
    real = shard_batch(mesh, np.random.RandomState(0).randn(BATCH, SIZE, SIZE, 3).astype("f4"))

    new_state, m_sharded = steps["d_step"](state_r, real, jax.random.PRNGKey(5))
    assert np.isfinite(float(m_sharded["discriminator_loss"]))
    new_state, m = steps["g_step"](new_state, jax.random.PRNGKey(6))
    assert np.isfinite(float(m["generator_loss"]))
    new_state, m = steps["g_reg_step"](new_state, jax.random.PRNGKey(7))
    assert np.isfinite(float(m["path_loss"]))

    # parity: sharded loss == single-device loss (same rng, same data)
    _, m_single = steps["d_step"](
        state, jnp.asarray(np.asarray(real)), jax.random.PRNGKey(5)
    )
    np.testing.assert_allclose(
        float(m_sharded["discriminator_loss"]),
        float(m_single["discriminator_loss"]),
        rtol=1e-5,
    )


def test_ema_accumulates_after_path_regularization():
    """EMA must blend the POST-regularization params (reference accumulate
    runs at the end of update_core, stylegan_2_updater.py:223)."""
    import numpy as np
    import optax

    from synthesis_in_style_tpu.models.stylegan2 import Discriminator, Generator
    from synthesis_in_style_tpu.updaters.stylegan2_updater import (
        StyleGAN2Config,
        create_gan_train_state,
        make_train_steps,
    )

    size = 16
    gen = Generator(size=size, style_dim=32, n_mlp=2, channel_multiplier=1)
    disc = Discriminator(size=size, channel_multiplier=1)
    tx = optax.sgd(1e-2)
    state = create_gan_train_state(gen, disc, jax.random.PRNGKey(0), size, tx, tx)
    cfg = StyleGAN2Config()
    steps = make_train_steps(gen, disc, tx, tx, cfg, batch_size=2, donate=False)

    state, _ = steps["g_step"](state, jax.random.PRNGKey(1))
    state, _ = steps["g_reg_step"](state, jax.random.PRNGKey(2))
    state, _ = steps["ema_step"](state)

    # ema = decay*ema0 + (1-decay)*g_params_post_reg; verify one leaf exactly
    leaf = jax.tree_util.tree_leaves(state.g_params)[0]
    ema_leaf = jax.tree_util.tree_leaves(state.g_ema)[0]
    # recompute from a fresh state0's ema (== initial params copy)
    state0 = create_gan_train_state(gen, disc, jax.random.PRNGKey(0), size, tx, tx)
    ema0_leaf = jax.tree_util.tree_leaves(state0.g_ema)[0]
    expected = cfg.ema_decay * np.asarray(ema0_leaf) + (
        1 - cfg.ema_decay
    ) * np.asarray(leaf)
    np.testing.assert_allclose(np.asarray(ema_leaf), expected, rtol=1e-5)


def test_frozen_stochastic_noise_layers(setup):
    """Per-layer frozen noise (reference stylegan_2_updater.py:35-43,
    :68-76): a frozen layer feeds its stored buffer every training forward
    (so perturbing the buffer changes the fakes), an unfrozen layer
    re-randomizes (so its buffer is ignored)."""
    import flax

    gen, disc, g_tx, d_tx, state, steps_free = setup
    real = _real_batch(jax.random.PRNGKey(1))
    rng = jax.random.PRNGKey(11)

    # NoiseInjection weights init to zero (reference model.py:283) — the
    # noise path is dead at fresh init, so turn it on for this test
    flat = flax.traverse_util.flatten_dict(state.g_params)
    flat = {
        k: jnp.ones_like(v) if k[-2:] == ("noise", "weight") else v
        for k, v in flat.items()
    }
    state = state.replace(g_params=flax.traverse_util.unflatten_dict(flat))

    def perturbed(st, name):
        noises = dict(st.g_noises)
        noises[name] = noises[name] + 10.0
        return st.replace(g_noises=noises)

    # freeze only layer 0
    cfg = StyleGAN2Config(freeze_noise_layers=(0,))
    steps = make_train_steps(gen, disc, g_tx, d_tx, cfg, BATCH, donate=False)

    _, base = steps["d_step"](state, real, rng)
    _, bumped_frozen = steps["d_step"](perturbed(state, "noise_0"), real, rng)
    _, bumped_free = steps["d_step"](perturbed(state, "noise_2"), real, rng)

    # frozen layer's buffer is live in the graph
    assert float(base["fake_score"]) != float(bumped_frozen["fake_score"])
    # unfrozen layer's buffer is NOT fed (fresh randomization each step)
    assert float(base["fake_score"]) == float(bumped_free["fake_score"])

    # with no freeze list, no buffer is fed at all
    _, free_base = steps_free["d_step"](state, real, rng)
    _, free_bumped = steps_free["d_step"](perturbed(state, "noise_0"), real, rng)
    assert float(free_base["fake_score"]) == float(free_bumped["fake_score"])

    # the G and path-reg steps also honor the freeze list (compile + run)
    st, m = steps["g_step"](state, rng)
    assert np.isfinite(float(m["generator_loss"]))
    _, m = steps["g_reg_step"](st, rng)
    assert np.isfinite(float(m["path_loss"]))


def test_restore_partial_optimizer_and_path_mean(setup):
    """A partial snapshot restores exactly what it carries: one optimizer
    alone must not KeyError or silently skip; training_state.mean_path_length
    round-trips (resume must not restart the path mean at 0)."""
    from synthesis_in_style_tpu.updaters.stylegan2_updater import (
        restore_gan_snapshot,
    )

    *_, state, steps = setup
    real = _real_batch(jax.random.PRNGKey(5))
    trained, _ = steps["d_step"](state, real, jax.random.PRNGKey(6))

    # discriminator optimizer only
    resumed = restore_gan_snapshot(
        state, {"discriminator_optimizer": trained.d_opt}
    )
    d_mu = jax.tree_util.tree_leaves(resumed.d_opt)
    assert any(float(jnp.abs(l).max()) > 0 for l in d_mu if l.ndim > 0)

    # generator optimizer only (previously raised KeyError on missing
    # discriminator_optimizer)
    resumed = restore_gan_snapshot(
        state, {"generator_optimizer": trained.g_opt}
    )

    # path-length running mean round-trip
    resumed = restore_gan_snapshot(
        state, {"training_state": {"mean_path_length": np.float32(0.73)}}
    )
    assert float(resumed.mean_path_length) == pytest.approx(0.73)
