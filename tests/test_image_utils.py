"""Port of reference tests/test_image_utils.py (text rendering changes only
the expected corner) + gt sanity check script."""

import numpy as np
import pytest
from PIL import Image

from synthesis_in_style_tpu.utils.dataset_creation import make_image
from synthesis_in_style_tpu.utils.image_utils import (
    render_text_on_image,
    resize_image,
)


@pytest.mark.parametrize("shape", [(1, 256, 256, 3), (256, 256, 3)])
def test_render_text(shape):
    rng = np.random.default_rng(0)
    tensor = rng.uniform(size=shape).astype(np.float32)
    tensor.reshape(-1)[0] = -1
    tensor.reshape(-1)[-1] = 1
    image = make_image(tensor)
    if image.ndim == 4:
        image = image[0]
    image_with_text = render_text_on_image("test", Image.fromarray(image.copy()))
    text_array = np.array(image_with_text)
    assert not np.allclose(image, text_array)
    assert np.allclose(image[:128, :128, :], text_array[:128, :128, :])


def test_resize_image_aspect():
    image = Image.new("RGB", (100, 50))
    out = resize_image(image, [-1, 200])
    assert out.size == (200, 100)
    out = resize_image(image, [100, -1])
    assert out.size == (200, 100)
    out = resize_image(image, [25, 30])
    assert out.size == (30, 25)


def test_gt_sanity_check(tmp_path):
    from synthesis_in_style_tpu.scripts.gt_sanity_check import (
        check_colors,
        postprocess_images,
    )

    gt = np.zeros((32, 32, 3), np.uint8)
    gt[4:12, 4:12] = (255, 0, 0)
    gt[20, 20] = (7, 7, 7)  # invalid color
    invalid = check_colors(
        gt, highlight_errors=True, image_path=tmp_path / "x.png",
        out_dir=tmp_path,
    )
    assert (7, 7, 7) in invalid
    highlighted = np.array(Image.open(tmp_path / "x_highlighted.png"))
    assert tuple(highlighted[20, 20]) == (0, 255, 0)

    clean = np.zeros((32, 32, 3), np.uint8)
    assert check_colors(clean) == set()

    out = postprocess_images(gt, tmp_path / "x.png", tmp_path)
    assert out.exists()
