"""Golden tests for the L0 ops vs a slow numpy oracle.

The reference only shipped its CUDA kernels untested against
`upfirdn2d_native`; here every (up, down, pad, kernel) configuration used by
StyleGAN2/SWAGAN is golden-checked, plus gradient and double-gradient paths
(needed by R1 / path-length regularization)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthesis_in_style_tpu.ops import (
    blur_2d,
    downsample_2d,
    fused_leaky_relu,
    make_kernel,
    scaled_leaky_relu,
    upfirdn2d,
    upsample_2d,
)
from synthesis_in_style_tpu.ops.upfirdn2d import upfirdn2d_reference


def _rand(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


# Every configuration StyleGAN2/SWAGAN actually uses:
#   Upsample:   up=2, k=4 taps, pad (2,1), kernel*4
#   Downsample: down=2, k=4, pad (1,1)
#   Blur (up path, k=3 conv): pad (1,1)
#   Blur (down path, k=3 conv): pad (2,2)  [p=(4-2)+(3-1)=4]
#   Haar DWT/IWT (SWAGAN): up/down=2 with 2-tap kernels
CASES = [
    dict(up=1, down=1, pad=(1, 1), k=4),
    dict(up=1, down=1, pad=(2, 2), k=4),
    dict(up=2, down=1, pad=(2, 1), k=4),
    dict(up=1, down=2, pad=(1, 1), k=4),
    dict(up=2, down=1, pad=(1, 0), k=2),
    dict(up=1, down=2, pad=(0, 0), k=2),
    dict(up=1, down=1, pad=(-1, -1), k=3),  # negative pad = crop
    dict(up=3, down=2, pad=(2, 2), k=5),  # generic fallback path
]


@pytest.mark.parametrize("case", CASES, ids=str)
def test_upfirdn2d_matches_oracle(case):
    x = _rand((2, 8, 8, 3))
    k = np.abs(_rand((case["k"], case["k"]), seed=1)) + 0.1
    got = upfirdn2d(jnp.asarray(x), jnp.asarray(k), case["up"], case["down"], case["pad"])
    want = upfirdn2d_reference(x, k, case["up"], case["down"], case["pad"])
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_upfirdn2d_asymmetric_pad():
    x = _rand((1, 6, 6, 2))
    k = np.abs(_rand((4, 4), seed=2)) + 0.1
    got = upfirdn2d(jnp.asarray(x), jnp.asarray(k), 2, 1, (3, 1, 2, 0))
    want = upfirdn2d_reference(x, k, 2, 1, (3, 1, 2, 0))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_make_kernel_outer_product_and_norm():
    k = make_kernel([1.0, 3.0, 3.0, 1.0])
    assert k.shape == (4, 4)
    np.testing.assert_allclose(float(jnp.sum(k)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(k), np.asarray(k).T)


def test_upsample_preserves_dc_and_doubles_size():
    k = make_kernel([1.0, 3.0, 3.0, 1.0])
    x = jnp.ones((1, 8, 8, 1))
    y = upsample_2d(x, k, 2)
    assert y.shape == (1, 16, 16, 1)
    # interior of an upsampled constant must stay ~1 (kernel gain = factor^2)
    np.testing.assert_allclose(np.asarray(y)[0, 4:-4, 4:-4, 0], 1.0, atol=1e-5)


def test_downsample_preserves_dc_and_halves_size():
    k = make_kernel([1.0, 3.0, 3.0, 1.0])
    x = jnp.ones((1, 16, 16, 1))
    y = downsample_2d(x, k, 2)
    assert y.shape == (1, 8, 8, 1)
    np.testing.assert_allclose(np.asarray(y)[0, 2:-2, 2:-2, 0], 1.0, atol=1e-5)


def test_blur_shapes():
    k = make_kernel([1.0, 3.0, 3.0, 1.0])
    x = jnp.ones((2, 8, 8, 4))
    assert blur_2d(x, k, (2, 1)).shape == (2, 8, 8, 4)


def test_upfirdn2d_grad_matches_numerical():
    x = _rand((1, 5, 5, 2))
    k = np.abs(_rand((4, 4), seed=3)) + 0.1

    def f(x_):
        return jnp.sum(upfirdn2d(x_, jnp.asarray(k), 2, 1, (2, 1)) ** 2)

    # float64 oracle for the numerical gradient (float32 fd is too noisy)
    def f64(x_):
        return float(np.sum(upfirdn2d_reference(x_.astype(np.float64), k, 2, 1, (2, 1)) ** 2))

    g = jax.grad(f)(jnp.asarray(x))
    eps = 1e-4
    i = (0, 2, 3, 1)
    xp, xm = x.astype(np.float64), x.astype(np.float64)
    xp, xm = xp.copy(), xm.copy()
    xp[i] += eps
    xm[i] -= eps
    num = (f64(xp) - f64(xm)) / (2 * eps)
    np.testing.assert_allclose(float(g[i]), num, rtol=1e-3)


def test_upfirdn2d_double_grad_exists():
    # R1/path-length regularization needs grad-of-grad through the FIR op.
    x = jnp.asarray(_rand((1, 4, 4, 1)))
    k = make_kernel([1.0, 2.0, 1.0])

    def f(x_):
        return jnp.sum(upfirdn2d(x_, k, 2, 1, (1, 1)) ** 2)

    def grad_norm(x_):
        return jnp.sum(jax.grad(f)(x_) ** 2)

    gg = jax.grad(grad_norm)(x)
    assert gg.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(gg)))


def test_fused_leaky_relu_semantics():
    x = jnp.asarray([[-1.0, 0.5]])
    b = jnp.asarray([0.5, 0.5])
    y = fused_leaky_relu(x, b)
    want = np.array([[-0.5 * 0.2, 1.0]]) * np.sqrt(2)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-6)


def test_scaled_leaky_relu():
    x = jnp.asarray([-2.0, 3.0])
    y = scaled_leaky_relu(x)
    np.testing.assert_allclose(
        np.asarray(y), np.array([-0.4, 3.0]) * np.sqrt(2), rtol=1e-6
    )


def test_fused_leaky_relu_grad():
    x = jnp.asarray(_rand((4, 8)))
    b = jnp.asarray(_rand((8,), seed=5))
    g = jax.grad(lambda x_, b_: jnp.sum(fused_leaky_relu(x_, b_)))(x, b)
    mask = np.asarray(x) + np.asarray(b) >= 0
    want = np.where(mask, np.sqrt(2), 0.2 * np.sqrt(2))
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-6)
