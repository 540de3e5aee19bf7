"""Autoencoder training, adversarial translation, and latent projection
(reference updater/autoencoder_updater.py, updater/adversarial_updater.py,
latent_projecting/)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from synthesis_in_style_tpu.models.autoencoder import StyleganAutoencoder
from synthesis_in_style_tpu.models.encoder import Latents, WPlusEncoder
from synthesis_in_style_tpu.models.stylegan2 import (

    Discriminator,
    Generator,
    generator_channels,
)

pytestmark = pytest.mark.slow  # excluded from the quick lane (-m 'not slow')


SIZE = 32
STYLE = 64
SCM = generator_channels(1)


@pytest.fixture(scope="module")
def gen():
    return Generator(size=SIZE, style_dim=STYLE, n_mlp=2, channel_multiplier=1)


@pytest.fixture(scope="module")
def autoencoder(gen):
    return StyleganAutoencoder(
        encoder=WPlusEncoder(SIZE, STYLE, 3, SCM), decoder=gen
    )


def test_autoencoder_train_step_only_updates_encoder(autoencoder):
    from synthesis_in_style_tpu.updaters.autoencoder_updater import (
        create_ae_train_state,
        make_autoencoder_train_step,
    )

    base_tx = optax.adam(1e-3)
    state, tx = create_ae_train_state(
        autoencoder, jax.random.PRNGKey(0), SIZE, base_tx
    )
    step = make_autoencoder_train_step(autoencoder, tx, donate=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, SIZE, SIZE, 3)).astype(np.float32))
    batch = {"input_image": x, "output_image": x}

    decoder_before = jax.tree_util.tree_leaves(state.params["decoder"])
    encoder_before = jax.tree_util.tree_leaves(state.params["encoder"])
    new_state, losses = step(state, batch, jax.random.PRNGKey(1))
    decoder_after = jax.tree_util.tree_leaves(new_state.params["decoder"])
    encoder_after = jax.tree_util.tree_leaves(new_state.params["encoder"])

    # decoder frozen (reference UpdateDisabler(decoder))
    for a, b in zip(decoder_before, decoder_after):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(encoder_before, encoder_after)
    )
    assert {"reconstruction_loss", "autoencoder_loss"} <= set(losses)


def test_autoencoder_gan_steps(autoencoder):
    from synthesis_in_style_tpu.updaters.autoencoder_updater import (
        create_ae_train_state,
        make_autoencoder_gan_steps,
    )

    disc = Discriminator(size=SIZE, channel_multiplier=1)
    base_tx = optax.adam(1e-3)
    d_tx = optax.adam(1e-3)
    state, tx = create_ae_train_state(
        autoencoder, jax.random.PRNGKey(0), SIZE, base_tx,
        discriminator=disc, d_tx=d_tx,
    )
    steps = make_autoencoder_gan_steps(
        autoencoder, disc, tx, d_tx, donate=False
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, SIZE, SIZE, 3)).astype(np.float32))
    batch = {"input_image": x, "output_image": x}
    state, d_metrics = steps["d_step"](state, batch, jax.random.PRNGKey(1))
    state, reg = steps["d_reg_step"](state, batch)
    state, g_metrics = steps["g_step"](state, batch, jax.random.PRNGKey(2))
    for v in {**d_metrics, **reg, **g_metrics}.values():
        assert np.isfinite(float(v))


def test_adversarial_steps(gen):
    from synthesis_in_style_tpu.losses.perceptual import PerceptualAndStyleLoss
    from synthesis_in_style_tpu.models.autoencoder import (
        ContentAndStyleStyleganAutoencoder,
    )
    from synthesis_in_style_tpu.updaters.adversarial_updater import (
        AdversarialTrainState,
        create_mask,
        make_adversarial_steps,
    )

    generation = ContentAndStyleStyleganAutoencoder(
        encoder=WPlusEncoder(SIZE, STYLE, 6, SCM), decoder=gen
    )
    reconstruction = StyleganAutoencoder(
        encoder=WPlusEncoder(SIZE, STYLE, 3, SCM), decoder=gen
    )
    disc = Discriminator(size=SIZE, channel_multiplier=1)

    key = jax.random.PRNGKey(0)
    binary = jnp.sign(jax.random.normal(key, (2, SIZE, SIZE, 3)))
    style = jax.random.normal(jax.random.PRNGKey(1), (2, SIZE, SIZE, 3))

    mask = create_mask(binary)
    assert mask.shape == (2, SIZE, SIZE, 1)
    np.testing.assert_allclose(
        np.unique(np.asarray(mask)), [0.0, 1.0], atol=1e-6
    )

    g_vars = generation.init({"params": key, "noise": key}, binary, style,
                             train=False)
    r_vars = reconstruction.init({"params": key, "noise": key}, style,
                                 train=False)
    d_vars = disc.init(key, style)
    g_tx = optax.adam(1e-3)
    d_tx = optax.adam(1e-3)
    state = AdversarialTrainState(
        g_params=g_vars["params"],
        g_batch_stats=g_vars.get("batch_stats", {}),
        g_noises=g_vars.get("noises", {}),
        d_params=d_vars["params"],
        reconstructor_variables=r_vars,
        g_opt=g_tx.init(g_vars["params"]),
        d_opt=d_tx.init(d_vars["params"]),
        step=jnp.zeros((), jnp.int32),
    )
    steps = make_adversarial_steps(
        generation, disc, reconstruction, g_tx, d_tx,
        PerceptualAndStyleLoss(use_style_loss=False), donate=False,
    )
    state, d_metrics = steps["d_step"](state, binary, style, jax.random.PRNGKey(2))
    state, reg = steps["d_reg_step"](state, style)
    state, g_metrics = steps["g_step"](state, binary, style, jax.random.PRNGKey(3))
    for v in {**d_metrics, **reg, **g_metrics}.values():
        assert np.isfinite(float(v))
    # frozen reconstructor untouched
    for a, b in zip(
        jax.tree_util.tree_leaves(state.reconstructor_variables["params"]),
        jax.tree_util.tree_leaves(r_vars["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latent_projection_reduces_loss(gen):
    from synthesis_in_style_tpu.latent_projecting import (
        Projector,
        naive_noise_loss,
        run_image_reconstruction,
        w_plus_loss,
    )
    from synthesis_in_style_tpu.losses.lpips import LPIPS

    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        [jnp.zeros((1, STYLE))],
    )
    projector = Projector(gen, variables)

    # target: an actual generator sample (so projection can succeed)
    z_true = jax.random.normal(jax.random.PRNGKey(5), (1, STYLE))
    w_true = gen.apply(variables, z_true, method=Generator.style)
    target_latents = Latents(
        latent=jnp.repeat(w_true[:, None, :], gen.n_latent, axis=1),
        noise=tuple(
            jnp.zeros((1,) + s[1:]) for s in gen.noise_shapes()
        ),
    )
    target = projector.generate(target_latents)

    # start from the mean latent
    w_mean = gen.apply(
        variables, jax.random.PRNGKey(6), 256, method=Generator.mean_latent
    )
    start = Latents(
        latent=jnp.repeat(w_mean[:, None, :], gen.n_latent, axis=1),
        noise=tuple(jnp.zeros((1,) + s[1:]) for s in gen.noise_shapes()),
    )

    lpips = LPIPS(net="alex")
    loss_fn = w_plus_loss({"l_percept": 1.0, "l_mse": 1.0}, lpips)
    initial_loss = float(loss_fn(projector.generate(start), target)[0])

    paths, best = run_image_reconstruction(
        projector, start, target, lpips,
        latent_step=30, noise_step=10, lr=0.05, noise_lr=1.0, mse=1.0,
    )
    final_loss = float(loss_fn(projector.generate(best), target)[0])
    assert final_loss < initial_loss
    assert len(paths) >= 2


def test_autoencoder_type_dispatch_from_config():
    """ADVICE r2: load path must honor the reference's config-key dispatch
    (networks/__init__.py:326-354) instead of always building wplus."""
    from synthesis_in_style_tpu.models.autoencoder import (
        DropoutStyleganAutoencoder,
        TwoStemStyleganAutoencoder,
    )
    from synthesis_in_style_tpu.models.encoder import WNoNoiseEncoder, WWPlusEncoder
    from synthesis_in_style_tpu.models.factory import (
        autoencoder_type_from_config,
        get_autoencoder,
    )

    base = {"image_size": 32, "latent_size": 16, "stylegan_variant": 2}
    assert autoencoder_type_from_config(base) == "wplus"
    assert autoencoder_type_from_config({**base, "dropout_autoencoder": True}) == "dropout"
    # two_stem beats dropout, like the reference's early return
    assert autoencoder_type_from_config(
        {**base, "two_stem": True, "dropout_autoencoder": True}
    ) == "two_stem"

    ae = get_autoencoder({**base, "dropout_autoencoder": True}, "dropout")
    assert isinstance(ae, DropoutStyleganAutoencoder)
    ae = get_autoencoder({**base, "two_stem": True, "w_only": True}, "two_stem")
    assert isinstance(ae, TwoStemStyleganAutoencoder)
    assert isinstance(ae.latent_encoder, WNoNoiseEncoder)
    ae = get_autoencoder({**base, "w_only": True}, "wplus")
    assert isinstance(ae.encoder, WWPlusEncoder)
