"""w8a8 quantized synthesis (ops/quant.py, Generator(quantized=True)).

The int8 serving path must (a) compute the exact integer conv, (b) bound
per-tensor quantization error by construction, and (c) keep the full
generator faithful enough that the downstream label-synthesis pipeline
(cluster assignment over intermediate activations) is unaffected.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthesis_in_style_tpu.ops.quant import (

    conv2d_w8a8,
    int8_conv,
    quantize_per_out_channel,
    quantize_per_sample,
)

pytestmark = pytest.mark.slow  # excluded from the quick lane (-m 'not slow')



def test_int8_conv_exact_integer_arithmetic():
    key = jax.random.PRNGKey(0)
    x = (jax.random.normal(key, (2, 9, 9, 5)) * 20).astype(jnp.int8)
    w = (jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 5, 7)) * 20).astype(
        jnp.int8
    )
    got = int8_conv(x, w, padding=1)
    ref = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        w.astype(jnp.float32),
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    assert got.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref, np.int64))


@pytest.mark.parametrize("kwargs", [
    dict(padding=1),
    dict(stride=2, padding=0),
    dict(padding=2, lhs_dilation=(2, 2)),
])
def test_int8_conv_exact_under_stride_and_dilation(kwargs):
    key = jax.random.PRNGKey(3)
    x = (jax.random.normal(key, (2, 8, 8, 4)) * 15).astype(jnp.int8)
    w = (jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 4, 6)) * 15).astype(
        jnp.int8
    )
    pad = kwargs["padding"]
    got = int8_conv(x, w, **kwargs)
    ref = jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        w.astype(jnp.float32),
        (kwargs.get("stride", 1),) * 2,
        ((pad, pad), (pad, pad)),
        lhs_dilation=kwargs.get("lhs_dilation"),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref, np.int64))


def test_conv2d_w8a8_up2_bitexact_vs_dilated():
    """The parity-decomposed int8 transposed conv must reproduce the
    lhs-dilated int8 conv EXACTLY (same int8 operands -> same int32 sums ->
    same dequant), including odd HxW."""
    from synthesis_in_style_tpu.ops.quant import conv2d_w8a8, conv2d_w8a8_up2

    key = jax.random.PRNGKey(9)
    for h, wdt in [(8, 8), (5, 7), (1, 1)]:
        x = jax.random.normal(key, (2, h, wdt, 6))
        w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 6, 4))
        ref = conv2d_w8a8(x, jnp.flip(w, (0, 1)), padding=2, lhs_dilation=(2, 2))
        got = conv2d_w8a8_up2(x, jnp.flip(w, (0, 1)))
        assert got.shape == (2, 2 * h + 1, 2 * wdt + 1, 4)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_quantize_per_sample_error_bound():
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 6, 6, 8)) * jnp.array(
        [0.1, 1.0, 50.0]
    ).reshape(3, 1, 1, 1)
    xq, scale = quantize_per_sample(x)
    assert xq.dtype == jnp.int8 and scale.shape == (3,)
    recon = np.asarray(xq, np.float32) * np.asarray(scale)[:, None, None, None]
    err = np.abs(recon - np.asarray(x))
    # symmetric rounding: |err| <= scale/2 elementwise, per sample
    assert (err <= np.asarray(scale)[:, None, None, None] / 2 + 1e-9).all()


def test_quantize_per_out_channel_error_bound():
    w = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 4, 6)) * jnp.linspace(
        0.01, 10.0, 6
    )
    wq, scale = quantize_per_out_channel(w)
    assert wq.dtype == jnp.int8 and scale.shape == (6,)
    recon = np.asarray(wq, np.float32) * np.asarray(scale)
    err = np.abs(recon - np.asarray(w))
    assert (err <= np.asarray(scale) / 2 + 1e-9).all()


def test_conv2d_w8a8_close_to_f32():
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (2, 16, 16, 32))
    w = jax.random.normal(jax.random.fold_in(key, 1), (3, 3, 32, 32)) * 0.1
    got = np.asarray(conv2d_w8a8(x, w, padding=1), np.float32)
    ref = np.asarray(
        jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ),
        np.float32,
    )
    rel = np.abs(got - ref).mean() / np.abs(ref).mean()
    assert rel < 0.02, rel


def _init_and_run(gen_cls, quantized, size=64):
    gen = gen_cls(size=size, style_dim=64, n_mlp=2, channel_multiplier=1)
    z = jax.random.normal(jax.random.PRNGKey(7), (2, 64))
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, [z]
    )
    gen_q = gen_cls(
        size=size, style_dim=64, n_mlp=2, channel_multiplier=1, quantized=quantized
    )
    img, acts = gen_q.apply(
        variables, [z], randomize_noise=False,
        return_intermediate_activations=True,
    )
    return np.asarray(img, np.float32), {
        k: np.asarray(v, np.float32) for k, v in acts.items()
    }


@pytest.mark.parametrize("family", ["stylegan2", "swagan"])
def test_quantized_generator_faithful(family):
    if family == "stylegan2":
        from synthesis_in_style_tpu.models.stylegan2 import Generator
    else:
        from synthesis_in_style_tpu.models.swagan import Generator

    img_f, acts_f = _init_and_run(Generator, quantized=False)
    img_q, acts_q = _init_and_run(Generator, quantized=True)

    # image fidelity: strong correlation + PSNR over the [-1,1]-ish range
    a, b = img_f.reshape(-1), img_q.reshape(-1)
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.995, corr
    mse = np.mean((a - b) ** 2)
    peak = a.max() - a.min()
    psnr = 10 * np.log10(peak**2 / mse)
    assert psnr > 28.0, psnr

    # the label-synthesis pipeline consumes intermediate activations; every
    # captured layer must stay highly correlated with the f32 path
    for k in acts_f:
        af, aq = acts_f[k].reshape(-1), acts_q[k].reshape(-1)
        c = np.corrcoef(af, aq)[0, 1]
        assert c > 0.99, (k, c)


def test_quantized_cluster_assignment_agreement():
    """The downstream consumer of the quantized generator is the
    label-synthesis pipeline, which k-means-assigns every pixel of the
    captured activations. Fit catalogs on the full-precision activations,
    assign both paths: the per-pixel cluster labels must agree almost
    everywhere (disagreements can only sit on cluster boundaries)."""
    from synthesis_in_style_tpu.models.stylegan2 import Generator
    from synthesis_in_style_tpu.segmentation.factor_catalog import FactorCatalog

    _, acts_f = _init_and_run(Generator, quantized=False)
    _, acts_q = _init_and_run(Generator, quantized=True)

    # mid/fine layers (the class-determination + finegrained keys in the
    # production configs); k=6 like the on-chip capstone run
    for layer in [4, 6]:
        catalog = FactorCatalog(k=6, seed=0)
        labels_f = np.asarray(catalog.fit_predict(acts_f[layer]))
        labels_q = np.asarray(catalog.predict(acts_q[layer]))
        agreement = (labels_f == labels_q).mean()
        assert agreement > 0.99, (layer, agreement)


def test_quantized_generator_parameters_identical():
    """quantized=True is a pure serving-mode reinterpretation — it must not
    change the parameter tree (same checkpoint loads in both modes)."""
    from synthesis_in_style_tpu.models.stylegan2 import Generator

    z = jnp.zeros((1, 64))
    v_f = Generator(size=32, style_dim=64, n_mlp=2, channel_multiplier=1).init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, [z]
    )
    v_q = Generator(
        size=32, style_dim=64, n_mlp=2, channel_multiplier=1, quantized=True
    ).init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, [z])
    assert jax.tree_util.tree_structure(v_f) == jax.tree_util.tree_structure(v_q)
    for a, b in zip(jax.tree_util.tree_leaves(v_f), jax.tree_util.tree_leaves(v_q)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
