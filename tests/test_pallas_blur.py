"""Pallas fused blur+demod+noise+bias+act kernel (ops/pallas/fused_blur.py).

Runs the kernel in interpret mode on the CPU mesh; the same code path
compiles on TPU (chip-verified — see MEASUREMENTS.md "Pallas fused-blur
study"). Golden reference is the exact XLA composition the kernel replaces:
upfirdn2d blur -> demod -> noise -> bias -> scaled LeakyReLU
(reference networks/stylegan2/model.py:182-342 tail ordering).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from synthesis_in_style_tpu.ops.pallas.fused_blur import (
    blur_demod_noise_bias_act,
    padded_width,
    supported_shape,
)
from synthesis_in_style_tpu.ops.upfirdn2d import upfirdn2d

K1 = jnp.array([0.25, 0.75, 0.75, 0.25], jnp.float32)
K2D = K1[:, None] * K1[None, :]


def _make_inputs(b, hin, c, seed=0):
    rs = np.random.RandomState(seed)
    wp = padded_width(hin)
    xr = jnp.asarray(rs.randn(b, hin, hin, c), jnp.float32)
    xpad = jnp.zeros((b, hin, wp, c), jnp.float32).at[:, :, 1 : 1 + hin, :].set(xr)
    demod = jnp.asarray(rs.rand(b, c) + 0.5, jnp.float32)
    noise = jnp.asarray(rs.randn(b, hin - 1, hin - 1), jnp.float32)
    bias = jnp.asarray(rs.randn(c), jnp.float32)
    return xr, xpad, demod, noise, bias


def _reference(xr, demod, noise, bias):
    pre = (
        upfirdn2d(xr, K2D, pad=(1, 1)) * demod[:, None, None, :]
        + noise[..., None]
        + bias
    )
    return jnp.where(pre >= 0, pre, pre * 0.2) * np.sqrt(2.0)


@pytest.mark.parametrize(
    "b,hin,c",
    [
        (2, 17, 16),  # single boundary-heavy tile layout
        (3, 33, 8),  # multi-tile rows, odd batch
        (2, 129, 32),  # production-sized rows
    ],
)
def test_forward_golden(b, hin, c):
    xr, xpad, demod, noise, bias = _make_inputs(b, hin, c)
    ref = _reference(xr, demod, noise, bias)
    got = blur_demod_noise_bias_act(
        xpad, demod, noise, bias, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_supported_shape_gate():
    assert supported_shape((2, 17, padded_width(17), 128))
    assert not supported_shape((2, 9, padded_width(9), 128))  # tiny layer
    assert not supported_shape((2, 17, 17, 128))  # unpadded width
    assert not supported_shape((2, 17, padded_width(17), 64))  # lane-partial


def test_grads_match_xla_composition():
    xr, xpad, demod, noise, bias = _make_inputs(2, 17, 8, seed=1)

    def ref_fn(xr, demod, noise, bias):
        return jnp.sum(jnp.sin(_reference(xr, demod, noise, bias)))

    def got_fn(xpad, demod, noise, bias):
        return jnp.sum(
            jnp.sin(
                blur_demod_noise_bias_act(
                    xpad, demod, noise, bias, interpret=True
                )
            )
        )

    gr = jax.grad(ref_fn, argnums=(0, 1, 2, 3))(xr, demod, noise, bias)
    gg = jax.grad(got_fn, argnums=(0, 1, 2, 3))(xpad, demod, noise, bias)
    # dx of the padded input: the pad columns never influence the output
    # inside the valid region... they DO receive blur-transpose mass, so
    # compare the real-column slice only.
    hin = xr.shape[1]
    np.testing.assert_allclose(
        np.asarray(gg[0][:, :, 1 : 1 + hin, :]), np.asarray(gr[0]), atol=1e-4
    )
    for a, b_ in zip(gr[1:], gg[1:]):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), atol=1e-4)


def test_double_grad_matches():
    """Path-length-regularizer shape: grad of a grad-norm. The custom_jvp
    rule must stay differentiable (a custom_vjp would raise here)."""
    xr, xpad, demod, noise, bias = _make_inputs(1, 17, 4, seed=2)

    def ref_fn(xr):
        return jnp.sum(jnp.sin(_reference(xr, demod, noise, bias)))

    def got_fn(xpad):
        return jnp.sum(
            jnp.sin(
                blur_demod_noise_bias_act(
                    xpad, demod, noise, bias, interpret=True
                )
            )
        )

    d2r = jax.grad(lambda x: jnp.sum(jax.grad(ref_fn)(x) ** 2))(xr)
    d2g = jax.grad(lambda x: jnp.sum(jax.grad(got_fn)(x) ** 2))(xpad)
    hin = xr.shape[1]
    np.testing.assert_allclose(
        np.asarray(d2g[:, :, 1 : 1 + hin, :]), np.asarray(d2r), atol=1e-3
    )


def test_styledconv_fused_parity():
    """Single fused StyledConv == unfused, same params and rng stream."""
    from synthesis_in_style_tpu.models.stylegan2 import StyledConv

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 8, 8, 128), jnp.float32)
    style = jnp.asarray(rs.randn(2, 64), jnp.float32)
    m0 = StyledConv(128, 3, upsample=True)
    m1 = StyledConv(128, 3, upsample=True, fused_blur=True)
    v = m0.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        x,
        style,
    )
    y0 = m0.apply(v, x, style, rngs={"noise": jax.random.PRNGKey(7)})
    y1 = m1.apply(v, x, style, rngs={"noise": jax.random.PRNGKey(7)})
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-5)


def test_generator_fused_parity():
    """Full generator, fused vs unfused: the first fused layer matches to
    float rounding; downstream layers amplify the reassociation delta by
    the convs' max-norm gain (measured ~x68/conv), so the image is checked
    with a propagation-aware relative bound + correlation."""
    from synthesis_in_style_tpu.models.stylegan2 import Generator

    g0 = Generator(size=32, style_dim=64, n_mlp=2)
    g1 = Generator(size=32, style_dim=64, n_mlp=2, fused_blur=True)
    z = jnp.asarray(np.random.RandomState(0).randn(2, 64), jnp.float32)
    v = g0.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, [z]
    )
    for kwargs in (
        {"randomize_noise": False},
        {"rngs": {"noise": jax.random.PRNGKey(7)}},
    ):
        img0, a0 = g0.apply(
            v, [z], return_intermediate_activations=True, **kwargs
        )
        img1, a1 = g1.apply(
            v, [z], return_intermediate_activations=True, **kwargs
        )
        # first fused layer (8->16 upsample) at float tolerance
        np.testing.assert_allclose(
            np.asarray(a1[4]), np.asarray(a0[4]), atol=1e-5
        )
        scale = float(jnp.max(jnp.abs(img0)))
        assert float(jnp.max(jnp.abs(img0 - img1))) / scale < 1e-2
        c = np.corrcoef(
            np.asarray(img0).ravel(), np.asarray(img1).ravel()
        )[0, 1]
        assert c > 0.9999, c


def test_fused_leaky_relu_pallas_interpret():
    """The standalone Pallas fused bias+act kernel (chip-verified after the
    bf16-compare fix; interpret-mode regression here)."""
    from jax.experimental.pallas import tpu as pltpu

    from synthesis_in_style_tpu.ops.fused_act import fused_leaky_relu
    from synthesis_in_style_tpu.ops.pallas.fused_bias_act import (
        fused_leaky_relu_pallas,
    )

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(4, 33, 16), jnp.float32)
    b = jnp.asarray(rs.randn(16), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        y1 = fused_leaky_relu_pallas(x, b)
        g1 = jax.grad(
            lambda x: jnp.sum(jnp.sin(fused_leaky_relu_pallas(x, b)))
        )(x)
    y0 = fused_leaky_relu(x, b)
    g0 = jax.grad(lambda x: jnp.sum(jnp.sin(fused_leaky_relu(x, b))))(x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=1e-5)
