"""SWAGAN model tests: Haar DWT/IWT exactness, generator/discriminator
shapes, activation-capture protocol (reference swagan/model.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthesis_in_style_tpu.models.swagan import (

    Discriminator,
    Generator,
    haar_transform,
    inverse_haar_transform,
)

pytestmark = pytest.mark.slow  # excluded from the quick lane (-m 'not slow')


SIZE = 32
STYLE_DIM = 64


def test_haar_roundtrip_is_identity(rng):
    x = jax.random.normal(rng, (2, 16, 16, 3))
    rec = inverse_haar_transform(haar_transform(x))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-5)


def test_haar_shapes_and_energy(rng):
    x = jax.random.normal(rng, (2, 16, 16, 3))
    y = haar_transform(x)
    assert y.shape == (2, 8, 8, 12)
    # orthonormal transform preserves energy
    np.testing.assert_allclose(
        float(jnp.sum(jnp.square(y))), float(jnp.sum(jnp.square(x))), rtol=1e-5
    )


def test_haar_constant_image_goes_to_ll_only():
    x = jnp.ones((1, 8, 8, 3))
    y = haar_transform(x)
    ll, lh, hl, hh = jnp.split(y, 4, axis=-1)
    np.testing.assert_allclose(np.asarray(ll), 2.0 * np.ones((1, 4, 4, 3)), atol=1e-6)
    for band in (lh, hl, hh):
        np.testing.assert_allclose(np.asarray(band), 0.0, atol=1e-6)


@pytest.fixture(scope="module")
def gen_and_vars():
    gen = Generator(size=SIZE, style_dim=STYLE_DIM, n_mlp=2)
    z = jnp.zeros((2, STYLE_DIM))
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, [z]
    )
    return gen, variables


def test_generator_output_size(gen_and_vars):
    gen, variables = gen_and_vars
    z = jax.random.normal(jax.random.PRNGKey(2), (2, STYLE_DIM))
    img, _ = gen.apply(variables, [z], rngs={"noise": jax.random.PRNGKey(3)})
    assert img.shape == (2, SIZE, SIZE, 3)


def test_generator_activation_protocol(gen_and_vars):
    """Keys 0..num_layers; wavelet-space resolutions (half pixel res)."""
    gen, variables = gen_and_vars
    z = jax.random.normal(jax.random.PRNGKey(2), (2, STYLE_DIM))
    img, acts = gen.apply(
        variables,
        [z],
        return_intermediate_activations=True,
        randomize_noise=False,
    )
    assert sorted(acts.keys()) == list(range(gen.num_layers + 1))
    assert acts[0].shape[1:3] == (4, 4)
    assert acts[gen.num_layers].shape[1:3] == (SIZE // 2, SIZE // 2)


def test_generator_fixed_noise_deterministic(gen_and_vars):
    gen, variables = gen_and_vars
    z = jax.random.normal(jax.random.PRNGKey(2), (2, STYLE_DIM))
    img1, _ = gen.apply(variables, [z], randomize_noise=False)
    img2, _ = gen.apply(variables, [z], randomize_noise=False)
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))


def test_discriminator_shape_and_grad(gen_and_vars):
    disc = Discriminator(size=SIZE)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, SIZE, SIZE, 3))
    d_vars = disc.init(jax.random.PRNGKey(1), x)
    out = disc.apply(d_vars, x)
    assert out.shape == (2, 1)

    def loss(params, x):
        return jnp.mean(disc.apply({"params": params}, x))

    grads = jax.grad(loss)(d_vars["params"], x)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


def test_style_mixing_inject_index(gen_and_vars):
    gen, variables = gen_and_vars
    z1 = jax.random.normal(jax.random.PRNGKey(4), (1, STYLE_DIM))
    z2 = jax.random.normal(jax.random.PRNGKey(5), (1, STYLE_DIM))
    img_a, _ = gen.apply(
        variables, [z1, z2], inject_index=1, randomize_noise=False
    )
    img_b, _ = gen.apply(
        variables, [z1, z2], inject_index=gen.n_latent - 1, randomize_noise=False
    )
    assert not np.allclose(np.asarray(img_a), np.asarray(img_b))
