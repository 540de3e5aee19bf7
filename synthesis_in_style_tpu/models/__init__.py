from synthesis_in_style_tpu.models.stylegan2 import (
    Generator as StyleGAN2Generator,
    Discriminator as StyleGAN2Discriminator,
)
from synthesis_in_style_tpu.models.swagan import (
    Generator as SwaganGenerator,
    Discriminator as SwaganDiscriminator,
)

__all__ = [
    "StyleGAN2Generator",
    "StyleGAN2Discriminator",
    "SwaganGenerator",
    "SwaganDiscriminator",
]
