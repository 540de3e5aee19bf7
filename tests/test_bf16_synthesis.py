"""bfloat16 synthesis fidelity: the production bench configuration must stay
numerically faithful to float32 (demodulation statistics remain f32 inside
ModulatedConv2d)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np


@pytest.mark.slow  # >20s on the 1-core host; full lane only
def test_bf16_generator_matches_f32():
    from synthesis_in_style_tpu.models.stylegan2 import Generator

    gen = Generator(size=32, style_dim=64, n_mlp=2, channel_multiplier=1)
    z = jax.random.normal(jax.random.PRNGKey(2), (2, 64))
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, [z]
    )
    img_f32, _ = gen.apply(variables, [z], randomize_noise=False)

    bf16_vars = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables,
    )
    img_bf16, _ = gen.apply(
        bf16_vars, [z.astype(jnp.bfloat16)], randomize_noise=False
    )
    assert img_bf16.dtype == jnp.bfloat16

    a = np.asarray(img_f32, np.float32).reshape(-1)
    b = np.asarray(img_bf16, np.float32).reshape(-1)
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.98, f"bf16 output diverged from f32: corr={corr}"
    rel_err = np.abs(a - b).mean() / (np.abs(a).mean() + 1e-8)
    assert rel_err < 0.2, rel_err
