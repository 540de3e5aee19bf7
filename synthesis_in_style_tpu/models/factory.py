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
    if str(variant) in ("2", "swagan"):
        # opt-in int8 serving path (ops/quant.py; synthesis configs key
        # `quantize`) — beyond-parity, see Generator.quantized docstring
        kwargs["quantized"] = bool(config.get("quantize", False))
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
        return stylegan2.Discriminator(
            input_channels=config.get("input_dim", 3), **kwargs
        )
    if str(variant) == "1":
        # (reference stylegan1 Discriminator factories,
        # networks/__init__.py:144-323 / stylegan1/model.py:533-604);
        # fixed-resolution use (adversarial training) runs the full
        # pyramid for the configured image size
        import math

        from synthesis_in_style_tpu.models.stylegan1 import (
            ProgressiveDiscriminator,
        )

        return ProgressiveDiscriminator(
            default_step=int(math.log2(config["image_size"])) - 2,
        )
    raise NotImplementedError(f"stylegan variant {variant!r} not supported")


def autoencoder_type_from_config(config: Dict[str, Any]) -> str:
    """Reference autoencoder-variant dispatch from config keys (reference
    get_stylegan_2_based_autoencoder, networks/__init__.py:326-354:
    `two_stem` beats `dropout_autoencoder`, else the plain wplus AE)."""
    if config.get("two_stem", False):
        return "two_stem"
    if config.get("dropout_autoencoder", False):
        return "dropout"
    return "wplus"


def get_autoencoder(config: Dict[str, Any], autoencoder_type: str = "wplus"):
    """Encoder+generator composition from a training config (reference
    get_autoencoder dispatch on stylegan_variant + the get_stylegan2_*
    factory family, networks/__init__.py:36-412).

    autoencoder_type: 'wplus' | 'dropout' | 'two_stem' | 'content_and_style'
    | 'superresolution' | 'wplus_resnet_noise'. The config's `w_only` flag
    swaps in the summed-to-w encoders (reference networks/__init__.py:335,
    :344 — WNoNoiseEncoder for two_stem, WWPlusEncoder otherwise).
    """
    from synthesis_in_style_tpu.models.autoencoder import (
        ContentAndStyleStyleganAutoencoder,
        DropoutStyleganAutoencoder,
        StyleganAutoencoder,
        SuperResolutionStyleganAutoencoder,
        TwoStemStyleganAutoencoder,
    )
    from synthesis_in_style_tpu.models.encoder import (
        NoiseEncoder,
        WNoNoiseEncoder,
        WPlusEncoder,
        WPlusNoNoiseEncoder,
        WPlusResnetNoiseEncoder,
        WWPlusEncoder,
    )
    from synthesis_in_style_tpu.models.stylegan2 import generator_channels

    decoder = get_generator(config)
    channels = generator_channels(config.get("channel_multiplier", 2))
    image_size = config["image_size"]
    latent_size = config.get("latent_size", 512)
    in_ch = config.get("input_dim", 3)
    variant = 2 if str(config.get("stylegan_variant", 2)) != "1" else 1
    w_only = bool(config.get("w_only", False))

    def wplus_encoder(num_channels=in_ch, **kwargs):
        cls = WWPlusEncoder if w_only else WPlusEncoder
        return cls(
            image_size, latent_size, num_channels, channels,
            stylegan_variant=variant, **kwargs,
        )

    if autoencoder_type == "wplus":
        return StyleganAutoencoder(encoder=wplus_encoder(), decoder=decoder)
    if autoencoder_type == "dropout":
        return DropoutStyleganAutoencoder(
            encoder=wplus_encoder(), decoder=decoder
        )
    if autoencoder_type == "wplus_resnet_noise":
        return StyleganAutoencoder(
            encoder=WPlusResnetNoiseEncoder(
                image_size, latent_size, in_ch, channels,
                stylegan_variant=variant,
            ),
            decoder=decoder,
        )
    if autoencoder_type == "content_and_style":
        return ContentAndStyleStyleganAutoencoder(
            encoder=wplus_encoder(num_channels=2 * in_ch), decoder=decoder
        )
    if autoencoder_type == "superresolution":
        return SuperResolutionStyleganAutoencoder(
            encoder=wplus_encoder(), decoder=decoder,
            extend_noise_with_random=config.get(
                "extend_noise_with_random", True
            ),
        )
    if autoencoder_type == "two_stem":
        latent_cls = WNoNoiseEncoder if w_only else WPlusNoNoiseEncoder
        return TwoStemStyleganAutoencoder(
            latent_encoder=latent_cls(
                image_size, latent_size, in_ch, channels,
                stylegan_variant=variant,
            ),
            noise_encoder=NoiseEncoder(
                image_size, latent_size, in_ch, channels,
                stylegan_variant=variant,
            ),
            decoder=decoder,
        )
    raise NotImplementedError(autoencoder_type)


def load_autoencoder_or_generator(
    checkpoint_path: Union[str, Path], config: Dict[str, Any]
) -> Tuple[Any, Dict[str, Any]]:
    """Load the full autoencoder when the snapshot carries an 'autoencoder'
    entry, otherwise the generator via 'g_ema' (reference
    load_autoencoder_or_generator, networks/__init__.py:415-423)."""
    checkpoint_path = Path(checkpoint_path)
    if checkpoint_path.is_dir():
        from synthesis_in_style_tpu.utils.checkpoint import load_pytree

        tree = load_pytree(checkpoint_path)
        if "autoencoder" in tree:
            ae = get_autoencoder(config, autoencoder_type_from_config(config))
            variables = jax.tree_util.tree_map(jnp.asarray, tree["autoencoder"])
            return ae, variables
    return load_generator(checkpoint_path, config)


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
