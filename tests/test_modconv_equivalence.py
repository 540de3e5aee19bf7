"""Numerical proof of the ModulatedConv2d reformulation.

The reference computes per-sample weights w'[b] = scale * w * s[b] (then
demodulates them) and runs a groups=batch conv (stylegan2/model.py:237-278).
Our TPU formulation keeps ONE shared weight and moves the style to the input
and the demodulation to the output. This test evaluates BOTH formulations
(the grouped one written directly from the math via vmap, not ported code)
and checks they agree to float tolerance — including the upsample
(conv-transpose) and downsample paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from synthesis_in_style_tpu.models.stylegan2 import ModulatedConv2d
from synthesis_in_style_tpu.ops import blur_2d, make_kernel, upsample_2d


def _per_sample_reference(x, weight, scale, style, demodulate, mode,
                          blur_kernel=(1, 3, 3, 1)):
    """Direct math: per-sample modulated (+demodulated) weights, one conv per
    sample via vmap — the grouped-conv semantics of the reference."""
    k = weight.shape[0]

    def one(x_i, s_i):
        w = scale * weight * s_i[None, None, :, None]  # (kh, kw, in, out)
        if demodulate:
            d = lax.rsqrt(jnp.sum(jnp.square(w), axis=(0, 1, 2)) + 1e-8)
            w = w * d[None, None, None, :]
        x_i = x_i[None]
        if mode == "up":
            out = lax.conv_general_dilated(
                x_i, jnp.flip(w, (0, 1)), (1, 1),
                [(k - 1, k - 1)] * 2, lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=lax.Precision.HIGHEST,
            )
            p = (len(blur_kernel) - 2) - (k - 1)
            out = blur_2d(
                out, make_kernel(list(blur_kernel)),
                ((p + 1) // 2 + 1, p // 2 + 1), upsample_factor=2,
            )
        elif mode == "down":
            p = (len(blur_kernel) - 2) + (k - 1)
            x_blur = blur_2d(
                x_i, make_kernel(list(blur_kernel)), ((p + 1) // 2, p // 2)
            )
            out = lax.conv_general_dilated(
                x_blur, w, (2, 2), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=lax.Precision.HIGHEST,
            )
        else:
            out = lax.conv_general_dilated(
                x_i, w, (1, 1), [(k // 2, k // 2)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=lax.Precision.HIGHEST,
            )
        return out[0]

    return jax.vmap(one)(x, style)


@pytest.mark.parametrize("mode", ["same", "up", "down"])
@pytest.mark.parametrize("demodulate", [True, False])
def test_modulated_conv_formulations_agree(mode, demodulate):
    rng = np.random.default_rng(0)
    batch, size, in_ch, out_ch, k = 3, 8, 5, 7, 3
    x = jnp.asarray(rng.normal(size=(batch, size, size, in_ch)).astype("f4"))
    style_in = jnp.asarray(rng.normal(size=(batch, 4)).astype("f4"))

    module = ModulatedConv2d(
        out_ch, k, demodulate=demodulate,
        upsample=(mode == "up"), downsample=(mode == "down"),
    )
    variables = module.init(jax.random.PRNGKey(0), x, style_in)
    ours = module.apply(variables, x, style_in)

    # recover the module's internals: equalized scale + modulation output
    weight = variables["params"]["weight"]
    scale = 1.0 / np.sqrt(in_ch * k * k)
    mod = variables["params"]["modulation"]
    s = style_in @ (mod["weight"] * (1.0 / np.sqrt(4))) + mod["bias"]

    theirs = _per_sample_reference(
        x, weight, scale, s, demodulate, mode
    )
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(theirs), rtol=2e-4, atol=2e-5
    )
