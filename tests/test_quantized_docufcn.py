"""Static w8a8 PTQ DocUFCN serving path (models/doc_ufcn_quant.py).

Pins (a) the exactness of the transpose-conv -> 1x1-conv + depth_to_space
reformulation against flax's own ConvTranspose, (b) fidelity of the
quantized forward vs the float path after calibration, for both decoder
variants, and (c) the serving adapter plumbing (quantize_for_serving).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from synthesis_in_style_tpu.models.doc_ufcn import DocUFCN
from synthesis_in_style_tpu.models import doc_ufcn_quant as dq

pytestmark = pytest.mark.slow  # excluded from the quick lane (-m 'not slow')




def test_transpose_up_tap_mapping_is_exact():
    """ConvTranspose(k=2, s=2, VALID) == 1x1 conv (taps as channels) +
    depth_to_space, in float — the identity the int8 upsample rides on."""
    rng = np.random.RandomState(0)
    b, h, w, c, o = 2, 5, 7, 6, 4
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    m = nn.ConvTranspose(o, (2, 2), strides=(2, 2), padding="VALID")
    v = m.init(jax.random.PRNGKey(0), x)
    ref = m.apply(v, x)

    kernel = v["params"]["kernel"]  # (2, 2, C, O)
    w1 = kernel[::-1, ::-1].transpose(2, 0, 1, 3).reshape(1, 1, c, 4 * o)
    pre = jax.lax.conv_general_dilated(
        x, w1, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )
    out = dq._depth_to_space_int8(pre, o) + v["params"]["bias"]
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def _fitted_model(pixel_shuffle: bool, seed: int = 0):
    """A DocUFCN with init params and a couple of train-mode BN updates so
    batch_stats are non-trivial; inputs in the normalized [-1, 1] domain."""
    model = DocUFCN(
        num_classes=3,
        feature_sizes=(8, 16, 24, 32),
        pixel_shuffle=pixel_shuffle,
    )
    rng = np.random.RandomState(seed)
    x = jnp.asarray(
        rng.uniform(-1.0, 1.0, size=(2, 64, 64, 3)).astype(np.float32)
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(seed), "dropout": jax.random.PRNGKey(1)},
        x,
        train=False,
    )
    # two train-mode steps to move BN running stats off the (0, 1) init
    for i in range(2):
        _, updates = model.apply(
            variables,
            x + 0.1 * i,
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2 + i)},
        )
        variables = {**variables, "batch_stats": updates["batch_stats"]}
    return model, variables, x


@pytest.mark.parametrize("pixel_shuffle", [False, True])
def test_quantized_forward_matches_float(pixel_shuffle):
    model, variables, x = _fitted_model(pixel_shuffle)
    float_logits = np.asarray(model.apply(variables, x, train=False))

    amax = dq.calibrate(model, variables, [x])
    # every ConvBNActDrop and decoder-block site must have been captured
    assert "encoder_0/conv_0" in amax and "decoder_0" in amax
    scales = dq.quant_scales_from_amax(amax)
    quant = dq.pack_quant(model, variables, scales)
    # all packed weights are int8 — no float weights inside the serving tree
    for name, site in quant.items():
        if "w_q" in site:
            assert site["w_q"].dtype == jnp.int8, name
    quant_logits = np.asarray(
        dq.quantized_forward(model, variables, quant, x)
    )

    assert quant_logits.shape == float_logits.shape
    assert np.isfinite(quant_logits).all()
    corr = np.corrcoef(quant_logits.ravel(), float_logits.ravel())[0, 1]
    assert corr > 0.995, corr
    agree = (
        quant_logits.argmax(-1) == float_logits.argmax(-1)
    ).mean()
    assert agree > 0.97, agree


def test_quantize_for_serving_adapter():
    model, variables, x = _fitted_model(pixel_shuffle=False, seed=3)
    network, qvars = dq.quantize_for_serving(model, variables, [x])
    assert "quant" in qvars
    out = np.asarray(network.apply(qvars, x, train=False))
    ref = np.asarray(model.apply(variables, x, train=False))
    assert out.shape == ref.shape
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert corr > 0.995, corr
    # config passthrough used by the serving stack
    cfg = network.segmenter_config()
    assert cfg.num_classes == model.num_classes


def test_quantize_for_serving_s2d_checkpoint():
    """The shipped segmenter configs enable s2d_stem/s2d_tail; quantized
    serving must consume such a model (same parameter tree) by running the
    unpacked lowering instead of crashing on packed 4C calibration scales."""
    import dataclasses

    model, variables, x = _fitted_model(pixel_shuffle=False, seed=5)
    s2d_model = dataclasses.replace(model, s2d_stem=1, s2d_tail=True)
    network, qvars = dq.quantize_for_serving(s2d_model, variables, [x])
    out = np.asarray(network.apply(qvars, x, train=False))
    ref = np.asarray(model.apply(variables, x, train=False))
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert corr > 0.995, corr


def test_calibration_accumulates_over_batches():
    model, variables, x = _fitted_model(pixel_shuffle=False, seed=4)
    a1 = dq.calibrate(model, variables, [x])
    a2 = dq.calibrate(model, variables, [x, 2.0 * x])
    for k in a1:
        assert (a2[k] >= a1[k] - 1e-6).all()


def test_serving_dtype_bf16_segmenter():
    """AnalysisSegmenter(serving_dtype="bfloat16") casts the variables once
    and still produces probability maps that agree with the f32 path."""
    import jax
    from PIL import Image

    from synthesis_in_style_tpu.models.base_segmenter import SegmenterConfig
    from synthesis_in_style_tpu.segmentation.analysis_segmenter import (
        AnalysisSegmenter,
    )

    model, variables, _ = _fitted_model(pixel_shuffle=False, seed=5)
    color_map = {"background": "#000000", "text": "#0000FF", "other": "#FF0000"}

    def build(**kwargs):
        return AnalysisSegmenter(
            None,
            class_to_color_map=color_map,
            network=model,
            network_variables=variables,
            config={"image_size": 64, "batch_size": 2, "num_classes": 3},
            segmenter_config=SegmenterConfig(
                num_classes=3, min_confidence=0.0, min_contour_area=0
            ),
            print_progress=False,
            **kwargs,
        )

    rng = np.random.RandomState(0)
    page = Image.fromarray(
        rng.randint(0, 255, (64, 96, 3)).astype(np.uint8), mode="RGB"
    )
    ref = np.asarray(build().segment_image(page))
    out_seg = build(serving_dtype="bfloat16")
    # params were cast once at construction
    leaf = jax.tree_util.tree_leaves(out_seg.network_variables["params"])[0]
    assert leaf.dtype == jnp.bfloat16
    out = np.asarray(out_seg.segment_image(page))
    agree = (ref.argmax(-1) == out.argmax(-1)).mean()
    assert agree > 0.99, agree

    with pytest.raises(ValueError, match="mutually exclusive"):
        build(serving_dtype="bfloat16", quantized=True)
