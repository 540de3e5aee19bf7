from synthesis_in_style_tpu.models.stylegan2 import (
    Generator as StyleGAN2Generator,
    Discriminator as StyleGAN2Discriminator,
)

__all__ = ["StyleGAN2Generator", "StyleGAN2Discriminator"]
