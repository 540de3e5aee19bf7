"""Fused whole-page inference == the batched patch path.

`AnalysisSegmenter(fused_page_inference=True)` runs patch extraction, the
patch forward, the device component filter, and max/vote assembly as ONE
jitted program per page tiling (analysis_segmenter._get_fused_page_fn).
These tests pin it against the unfused path (host patch cropping +
per-batch predict + numpy assembly), which is itself pinned against the
reference semantics (analysis_segmenter.py:130-223) elsewhere.
"""

import numpy as np
import pytest
from PIL import Image

from synthesis_in_style_tpu.models.base_segmenter import SegmenterConfig
from synthesis_in_style_tpu.segmentation.analysis_segmenter import (

    AnalysisSegmenter,
    VotingAssemblySegmenter,
)

pytestmark = pytest.mark.slow  # excluded from the quick lane (-m 'not slow')



@pytest.fixture(scope="module")
def conv_net():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    class TinyConv(nn.Module):
        num_classes: int = 3

        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(8, (3, 3), padding="SAME")(x)
            x = nn.relu(x)
            return nn.Conv(self.num_classes, (3, 3), padding="SAME")(x)

    net = TinyConv()
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    return net, variables


COLOR_MAP = {
    "background": "#000000",
    "printed_text": "#0000FF",
    "handwritten_text": "#FF0000",
}


def _build(cls, conv_net, fused, min_contour_area, **kwargs):
    net, variables = conv_net
    return cls(
        None,
        class_to_color_map=COLOR_MAP,
        network=net,
        network_variables=variables,
        config={"image_size": 16, "batch_size": 4, "num_classes": 3},
        segmenter_config=SegmenterConfig(
            num_classes=3, min_confidence=0.0, min_contour_area=min_contour_area
        ),
        # the fused program always filters on device; match the unfused side
        use_device_component_filter=min_contour_area > 0,
        fused_page_inference=fused,
        **kwargs,
    )


@pytest.mark.parametrize("cls", [AnalysisSegmenter, VotingAssemblySegmenter])
@pytest.mark.parametrize(
    "page_hw,overlap_kwargs",
    [
        ((30, 46), {}),  # ragged page, automatic even overlap + zero-pad border
        ((32, 32), {"patch_overlap_factor": 0.5}),  # heavy overlap
        ((16, 16), {}),  # single patch, padded batch
    ],
)
def test_fused_matches_unfused(cls, conv_net, page_hw, overlap_kwargs):
    rng = np.random.default_rng(0)
    page = Image.fromarray(
        rng.integers(0, 255, (*page_hw, 3), np.uint8), mode="RGB"
    )
    unfused = _build(cls, conv_net, False, 0, **overlap_kwargs)
    fused = _build(cls, conv_net, True, 0, **overlap_kwargs)
    a = unfused.segment_image(page)
    b = fused.segment_image(page)
    assert b.shape == (*page_hw, 3)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_fused_matches_unfused_with_device_filter(conv_net):
    rng = np.random.default_rng(1)
    page = Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8), "RGB")
    unfused = _build(VotingAssemblySegmenter, conv_net, False, 12)
    fused = _build(VotingAssemblySegmenter, conv_net, True, 12)
    np.testing.assert_allclose(
        unfused.segment_image(page), fused.segment_image(page), atol=1e-5
    )


def test_fused_set_hyperparams_no_recompile(conv_net):
    """Thresholds are traced arguments: sweeping them must (a) change the
    output and (b) reuse the SAME compiled program — the sweep CLI's
    per-config cost is one dispatch, not one XLA compile."""
    rng = np.random.default_rng(2)
    page = Image.fromarray(rng.integers(0, 255, (24, 24, 3), np.uint8), "RGB")
    seg = _build(VotingAssemblySegmenter, conv_net, True, 0)
    first = seg.segment_image(page)
    assert len(seg._fused_fns) == 1
    (fused_before,) = seg._fused_fns.values()
    seg.set_hyperparams({"min_confidence": 0.9})
    second = seg.segment_image(page)
    assert seg.segmenter_config.min_confidence == 0.9
    assert len(seg._fused_fns) == 1  # same tiling + same filter structure
    (fused_after,) = seg._fused_fns.values()
    assert fused_after is fused_before
    # the traced threshold reached the program: only ONE trace happened
    # for this jitted callable across both configs
    assert fused_after._cache_size() == 1
    # a 0.9 threshold on a 3-class softmax zeroes more mass than 0.0 did
    assert second.sum() <= first.sum() + 1e-6
    assert not np.allclose(first, second)


def test_unfused_sweep_no_recompile(conv_net):
    """The per-patch path likewise keys its compiled programs only on the
    (device_filter, area>0) structure; positive-area sweeps share one."""
    rng = np.random.default_rng(3)
    page = Image.fromarray(rng.integers(0, 255, (24, 24, 3), np.uint8), "RGB")
    seg = _build(VotingAssemblySegmenter, conv_net, False, 12)
    outs = []
    for area in (12, 40):
        for conf in (0.0, 0.9):
            seg.set_hyperparams(
                {"min_confidence": conf, "min_contour_area": area}
            )
            outs.append(seg.segment_image(page))
    assert len(seg._predict_fns) == 1
    (predict,) = seg._predict_fns.values()
    assert predict._cache_size() == 1
    assert not np.allclose(outs[0], outs[1])
    # crossing the 0 <-> >0 area boundary keys the one structural variant
    seg.set_hyperparams({"min_contour_area": 0})
    seg.segment_image(page)
    assert len(seg._predict_fns) == 2
