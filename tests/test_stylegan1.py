"""StyleGAN1 progressive model tests (reference networks/stylegan1/model.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthesis_in_style_tpu.models.stylegan1 import (

    ProgressiveDiscriminator,
    StyledGenerator,
)

pytestmark = pytest.mark.slow  # excluded from the quick lane (-m 'not slow')


SIZE = 32  # step = 3
CODE = 64


@pytest.fixture(scope="module")
def gen_and_vars():
    gen = StyledGenerator(size=SIZE, code_dim=CODE, n_mlp=2)
    z = jnp.zeros((2, CODE))
    noise = [jnp.zeros((2,) + s[1:]) for s in gen.noise_shapes()]
    variables = gen.init({"params": jax.random.PRNGKey(0)}, [z], noise=noise)
    return gen, variables


def test_generator_full_resolution(gen_and_vars):
    gen, variables = gen_and_vars
    z = jax.random.normal(jax.random.PRNGKey(1), (2, CODE))
    noise = [
        jax.random.normal(jax.random.PRNGKey(10 + i), (2,) + s[1:])
        for i, s in enumerate(gen.noise_shapes())
    ]
    image, acts = gen.apply(
        variables, [z], noise=noise, return_intermediate_activations=True
    )
    assert image.shape == (2, SIZE, SIZE, 3)
    # activation protocol: one per progression block, 0..step
    assert sorted(acts.keys()) == list(range(gen.step + 1))
    assert acts[0].shape[1:3] == (4, 4)
    assert acts[gen.step].shape[1:3] == (SIZE, SIZE)


def test_generator_progressive_step():
    gen = StyledGenerator(size=SIZE, code_dim=CODE, n_mlp=2)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, CODE))
    noise = [
        jax.random.normal(jax.random.PRNGKey(20 + i), (1,) + s[1:])
        for i, s in enumerate(gen.noise_shapes())
    ]
    # params materialize for the init step (see module docstring)
    variables = gen.init(
        {"params": jax.random.PRNGKey(0)}, [z], noise=noise[:3], step=2
    )
    image, _ = gen.apply(variables, [z], noise=noise[:3], step=2, alpha=0.5)
    assert image.shape == (1, 16, 16, 3)


def test_generator_alpha_blend_changes_output(gen_and_vars):
    gen, variables = gen_and_vars
    z = jax.random.normal(jax.random.PRNGKey(1), (1, CODE))
    noise = [
        jax.random.normal(jax.random.PRNGKey(30 + i), (1,) + s[1:])
        for i, s in enumerate(gen.noise_shapes())
    ]
    img_full, _ = gen.apply(variables, [z], noise=noise, alpha=1.0)
    img_blend, _ = gen.apply(variables, [z], noise=noise, alpha=0.3)
    assert not np.allclose(np.asarray(img_full), np.asarray(img_blend))


def test_mean_style(gen_and_vars):
    gen, variables = gen_and_vars
    z = jax.random.normal(jax.random.PRNGKey(2), (16, CODE))
    mean = gen.apply(variables, z, method=StyledGenerator.mean_style)
    assert mean.shape == (1, CODE)


def test_discriminator_progressive():
    disc = ProgressiveDiscriminator()
    x32 = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    variables = disc.init(jax.random.PRNGKey(1), x32, step=3, alpha=0.5)
    out = disc.apply(variables, x32, step=3, alpha=0.5)
    assert out.shape == (2, 1)
    # alpha=1 shares the same params
    out_full = disc.apply(variables, x32, step=3, alpha=1.0)
    assert out_full.shape == (2, 1)
    assert not np.allclose(np.asarray(out), np.asarray(out_full))
