"""Model factory + checkpoint-backed loading (reference
networks/__init__.py:32-423 `get_stylegan2_generator` / swagan factories /
`load_autoencoder_or_generator`).

No ninja/CUDA gating — the TPU kernels are pure XLA (reference hard-gates all
StyleGAN2 factories on a ninja install, networks/__init__.py:32,140-141)."""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from synthesis_in_style_tpu.models import stylegan2, swagan
from synthesis_in_style_tpu.utils.checkpoint import load_generator_variables


def get_generator(
    config: Dict[str, Any], variant: Optional[Union[str, int]] = None
):
    """Build the generator module from a training config (keys
    `image_size`, `latent_size`, `n_mlp`, `channel_multiplier`,
    `stylegan_variant` — reference get_autoencoder dispatch,
    networks/__init__.py:396-412)."""
    variant = variant if variant is not None else config.get("stylegan_variant", 2)
    kwargs = dict(
        size=config["image_size"],
        style_dim=config.get("latent_size", 512),
        n_mlp=config.get("n_mlp", 8),
        channel_multiplier=config.get("channel_multiplier", 2),
    )
    if str(variant) == "swagan":
        return swagan.Generator(**kwargs)
    if str(variant) == "2":
        return stylegan2.Generator(**kwargs)
    if str(variant) == "1":
        # (reference get_stylegan1_generator, networks/__init__.py:144-151);
        # the synthesis CLIs target variant 2 / swagan — same as the
        # reference's shipped creation configs
        from synthesis_in_style_tpu.models.stylegan1 import StyledGenerator

        return StyledGenerator(
            size=config["image_size"],
            code_dim=config.get("latent_size", 512),
            n_mlp=config.get("n_mlp", 8),
        )
    raise NotImplementedError(f"stylegan variant {variant!r} not supported")


def get_discriminator(
    config: Dict[str, Any], variant: Optional[Union[str, int]] = None
):
    variant = variant if variant is not None else config.get("stylegan_variant", 2)
    kwargs = dict(
        size=config["image_size"],
        channel_multiplier=config.get("channel_multiplier", 2),
    )
    if str(variant) == "swagan":
        return swagan.Discriminator(**kwargs)
    if str(variant) == "2":
        return stylegan2.Discriminator(**kwargs)
    raise NotImplementedError(f"stylegan variant {variant!r} not supported")


def load_generator(
    checkpoint_path: Union[str, Path],
    config: Dict[str, Any],
    key: str = "g_ema",
) -> Tuple[Any, Dict[str, Any]]:
    """(module, variables) from an orbax snapshot or reference torch .pt
    (reference load_autoencoder_or_generator, networks/__init__.py:415-423)."""
    gen = get_generator(config)
    variables = load_generator_variables(checkpoint_path, key=key)
    variables = jax.tree_util.tree_map(jnp.asarray, variables)
    if "noises" not in variables:
        # materialize default noise buffers so fixed-noise synthesis works
        z = jnp.zeros((1, gen.style_dim))
        init_vars = gen.init(
            {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, [z]
        )
        variables = {**variables, "noises": init_vars["noises"]}
    return gen, variables
