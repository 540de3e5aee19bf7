from synthesis_in_style_tpu.losses.gan import (
    d_logistic_loss,
    g_nonsaturating_loss,
)

__all__ = ["d_logistic_loss", "g_nonsaturating_loss"]
