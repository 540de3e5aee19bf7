"""Perceptual/style/LPIPS losses + encoder/autoencoder compositions
(reference losses/*, networks/encoder/*)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthesis_in_style_tpu.losses.lpips import LPIPS
from synthesis_in_style_tpu.losses.perceptual import (
    PerceptualAndStyleLoss,
    gram_matrix,
    perceptual_loss,
    style_loss,
)
from synthesis_in_style_tpu.models.encoder import (
    Encoder,
    Latents,
    NoiseEncoder,
    WEncoder,
    WPlusEncoder,
    WPlusNoNoiseEncoder,
    WWPlusEncoder,
)
from synthesis_in_style_tpu.models.stylegan2 import Generator, generator_channels

SIZE = 32
STYLE = 64
SCM = generator_channels(1)


def test_gram_matrix_matches_reference_formula():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(1, 4, 5, 3)).astype(np.float32)
    g = np.asarray(gram_matrix(jnp.asarray(feats)))
    flat = feats[0].transpose(2, 0, 1).reshape(3, 20)  # (C, HW)
    expected = flat @ flat.T
    np.testing.assert_allclose(g, expected, rtol=1e-5)


def test_perceptual_and_style_loss_zero_for_identical():
    loss = PerceptualAndStyleLoss()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, SIZE, SIZE, 3))
    s, p = loss(x, x)
    assert float(s) == pytest.approx(0.0, abs=1e-6)
    assert float(p) == pytest.approx(0.0, abs=1e-6)
    y = jax.random.normal(jax.random.PRNGKey(1), (1, SIZE, SIZE, 3))
    s2, p2 = loss(x, y)
    assert float(p2) > 0 and float(s2) > 0


def test_perceptual_loss_is_differentiable():
    loss = PerceptualAndStyleLoss()
    y = jax.random.normal(jax.random.PRNGKey(1), (1, SIZE, SIZE, 3))

    def f(x):
        s, p = loss(x, y)
        return s + p

    g = jax.grad(f)(jnp.zeros((1, SIZE, SIZE, 3)))
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.parametrize("net", ["alex", "vgg"])
def test_lpips_basics(net):
    lp = LPIPS(net=net)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, SIZE, SIZE, 3))
    d_same = lp(x, x)
    assert d_same.shape == (2,)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-6)
    y = jax.random.normal(jax.random.PRNGKey(1), (2, SIZE, SIZE, 3))
    assert np.all(np.asarray(lp(x, y)) > 0)


def test_lpips_lin_weight_loading():
    lin_path = (
        "/root/reference/stylegan_code_finder/losses/lpips/weights/v0.1/alex.pth"
    )
    import os

    if not os.path.exists(lin_path):
        pytest.skip("no lin weights available")
    lp = LPIPS(net="alex", lin_weights_path=lin_path)
    assert len(lp.lin_weights) == 5
    assert lp.lin_weights[0].shape == (64,)


# ---------------- encoders ---------------------------------------------------

@pytest.fixture(scope="module")
def gen():
    return Generator(size=SIZE, style_dim=STYLE, n_mlp=2, channel_multiplier=1)


def _init_and_run(encoder, x):
    variables = encoder.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    return encoder.apply(variables, x, train=False), variables


def test_wplus_encoder_shapes(gen):
    enc = WPlusEncoder(SIZE, STYLE, 3, SCM)
    x = jnp.zeros((2, SIZE, SIZE, 3))
    latents, _ = _init_and_run(enc, x)
    assert latents.latent.shape == (2, gen.n_latent, STYLE)
    assert len(latents.noise) == gen.num_layers
    # noise resolutions match the generator buffers (smallest first)
    for noise, shape in zip(latents.noise, gen.noise_shapes()):
        assert noise.shape[1:3] == shape[1:3]
        assert noise.shape[-1] == 1


def test_w_encoder_and_noise_encoder(gen):
    x = jnp.zeros((2, SIZE, SIZE, 3))
    latents, _ = _init_and_run(WEncoder(SIZE, STYLE, 3, SCM), x)
    assert latents.latent.shape == (2, STYLE)
    assert len(latents.noise) == gen.num_layers

    latents, _ = _init_and_run(NoiseEncoder(SIZE, STYLE, 3, SCM), x)
    assert latents.latent is None
    assert len(latents.noise) == gen.num_layers

    latents, _ = _init_and_run(WPlusNoNoiseEncoder(SIZE, STYLE, 3, SCM), x)
    assert latents.latent.shape == (2, gen.n_latent, STYLE)
    assert latents.noise is None

    latents, _ = _init_and_run(WWPlusEncoder(SIZE, STYLE, 3, SCM), x)
    assert latents.latent.shape == (2, STYLE)


def test_resnet_encoder(gen):
    enc = Encoder(SIZE, STYLE, 3, SCM)
    x = jnp.zeros((2, SIZE, SIZE, 3))
    out, _ = _init_and_run(enc, x)
    assert out.shape == (2, gen.n_latent, STYLE)


# ---------------- autoencoder compositions -----------------------------------

def test_stylegan_autoencoder_roundtrip(gen):
    from synthesis_in_style_tpu.models.autoencoder import (
        StyleganAutoencoder,
        encoder_param_mask,
    )

    enc = WPlusEncoder(SIZE, STYLE, 3, SCM)
    ae = StyleganAutoencoder(encoder=enc, decoder=gen)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, SIZE, SIZE, 3))
    variables = ae.init({"params": jax.random.PRNGKey(1)}, x, train=False)
    out = ae.apply(variables, x, train=False)
    assert out.shape == (2, SIZE, SIZE, 3)

    mask = encoder_param_mask(variables["params"])
    leaves = jax.tree_util.tree_leaves_with_path(mask)
    enc_flags = [v for p, v in leaves if p[0].key == "encoder"]
    dec_flags = [v for p, v in leaves if p[0].key == "decoder"]
    assert all(enc_flags) and not any(dec_flags)

    latents = ae.apply(variables, x, train=False, method=StyleganAutoencoder.encode)
    assert isinstance(latents, Latents)


def test_two_stem_autoencoder(gen):
    from synthesis_in_style_tpu.models.autoencoder import TwoStemStyleganAutoencoder
    from synthesis_in_style_tpu.models.encoder import (
        NoiseEncoder,
        WPlusNoNoiseEncoder,
    )

    ae = TwoStemStyleganAutoencoder(
        latent_encoder=WPlusNoNoiseEncoder(SIZE, STYLE, 3, SCM),
        noise_encoder=NoiseEncoder(SIZE, STYLE, 3, SCM),
        decoder=gen,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, SIZE, SIZE, 3))
    variables = ae.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        x, train=False,
    )
    out = ae.apply(variables, x, train=False, rngs={"noise": jax.random.PRNGKey(3)})
    assert out.shape == (1, SIZE, SIZE, 3)


def test_super_resolution_autoencoder():
    from synthesis_in_style_tpu.models.autoencoder import (
        SuperResolutionStyleganAutoencoder,
    )

    decoder = Generator(size=64, style_dim=STYLE, n_mlp=2, channel_multiplier=1)
    enc = WPlusEncoder(SIZE, STYLE, 3, SCM)
    ae = SuperResolutionStyleganAutoencoder(encoder=enc, decoder=decoder)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    variables = ae.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        x, train=False,
    )
    out = ae.apply(variables, x, train=False, rngs={"noise": jax.random.PRNGKey(3)})
    assert out.shape == (1, 64, 64, 3)
