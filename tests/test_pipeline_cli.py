"""End-to-end pipeline test on CPU: snapshot a tiny generator, discover
clusters, hand-label them, synthesize a labelled dataset with train/val
split + COCO GT — the full paper workflow (reference call stacks 3.3/3.4),
plus unit tests for the RLE codec and the torch<->flax converter."""

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthesis_in_style_tpu.evaluation.coco_gt import (
    rle_area,
    rle_decode,
    rle_encode,
    rle_to_bbox,
)
from synthesis_in_style_tpu.models.stylegan2 import Generator
from synthesis_in_style_tpu.utils.checkpoint import (
    flax_generator_to_torch,
    load_generator_variables,
    save_pytree,
    torch_generator_to_flax,
)

pytestmark = pytest.mark.slow  # excluded from the quick lane (-m 'not slow')


SIZE = 32
STYLE_DIM = 32


# ---------------- RLE codec -------------------------------------------------

def test_rle_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(5):
        mask = (rng.uniform(size=(13, 17)) > 0.5).astype(np.uint8)
        rle = rle_encode(mask)
        np.testing.assert_array_equal(rle_decode(rle), mask)
        assert rle_area(rle) == int(mask.sum())


def test_rle_bbox():
    mask = np.zeros((10, 12), np.uint8)
    mask[2:5, 3:9] = 1
    assert rle_to_bbox(rle_encode(mask)) == [3.0, 2.0, 6.0, 3.0]


def test_rle_matches_pycocotools_format():
    """Empty and full masks encode to the documented corner cases."""
    empty = np.zeros((4, 4), np.uint8)
    rle = rle_encode(empty)
    assert rle_decode(rle).sum() == 0
    full = np.ones((4, 4), np.uint8)
    rle = rle_encode(full)
    assert rle_decode(rle).sum() == 16


# ---------------- torch <-> flax converter ----------------------------------

def test_generator_converter_roundtrip():
    gen = Generator(size=SIZE, style_dim=STYLE_DIM, n_mlp=2)
    z = jnp.zeros((1, STYLE_DIM))
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, [z]
    )
    variables = jax.tree_util.tree_map(np.asarray, variables)
    torch_sd = flax_generator_to_torch(variables)
    # torch layout shapes
    assert torch_sd["input.input"].shape[1] == variables["params"]["input"].shape[-1]
    assert torch_sd["conv1.conv.weight"].ndim == 5
    back = torch_generator_to_flax(torch_sd)

    flat_a = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(variables["params"])
    }
    flat_b = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_leaves_with_path(back["params"])
    }
    assert sorted(flat_a) == sorted(flat_b)
    for key in flat_a:
        np.testing.assert_array_equal(flat_a[key], flat_b[key])
    # converted variables actually run
    img, _ = gen.apply(back, [jnp.ones((1, STYLE_DIM))], randomize_noise=False)
    assert img.shape == (1, SIZE, SIZE, 3)


# ---------------- full pipeline ---------------------------------------------

import pytest



@pytest.mark.parametrize(
    "extra_args",
    [[], ["--device-contours"], ["--quantize"]],
    ids=["host-contours", "device-contours", "quantized"],
)
def test_full_synthesis_pipeline(tmp_path, extra_args):
    from synthesis_in_style_tpu.cli import (
        create_dataset_for_segmentation as cds,
    )
    from synthesis_in_style_tpu.cli import (
        create_semantic_segmentation as css,
    )

    # --- train-run layout: <run>/checkpoints/<snap>, <run>/config/config.json
    run_dir = tmp_path / "run"
    ckpt_dir = run_dir / "checkpoints" / "iter_00000001"
    config = {
        "image_size": SIZE,
        "latent_size": STYLE_DIM,
        "n_mlp": 2,
        "stylegan_variant": 2,
        "batch_size": 4,
    }
    (run_dir / "config").mkdir(parents=True)
    (run_dir / "config" / "config.json").write_text(json.dumps(config))

    gen = Generator(size=SIZE, style_dim=STYLE_DIM, n_mlp=2)
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        [jnp.zeros((1, STYLE_DIM))],
    )
    save_pytree(
        ckpt_dir,
        {"g_ema": variables["params"], "g_noises": variables["noises"]},
    )
    loaded = load_generator_variables(ckpt_dir)
    assert "params" in loaded and "noises" in loaded

    # --- stage 1: cluster discovery
    css_args = argparse.Namespace(
        checkpoint=str(ckpt_dir),
        original_config_path=None,
        destination="semantic_segmentation",
        batch_size=2,
        num_samples=4,
        cluster_range=[3, 4],
        strip_activations_from=4,
    )
    css.main(css_args)
    sem_dir = run_dir / "semantic_segmentation"
    assert (sem_dir / "catalogs" / "3.npz").exists()
    assert (sem_dir / "cluster_arrays" / "3.npz").exists()
    assert (sem_dir / "cluster_images" / "3.png").exists()

    # --- stage 2: "human" labelling — map every cluster of every layer
    catalogs = np.load(sem_dir / "catalogs" / "3.npz")
    layer_ids = [
        name[len("centers_"):]
        for name in catalogs.files
        if name.startswith("centers_")
    ]
    label_names = ["background", "printed_text", "handwritten_text"]
    label_map = {
        layer: {str(i): label_names[i % 3] for i in range(3)}
        for layer in layer_ids
    }
    (sem_dir / "merged_classes_3.json").write_text(json.dumps(label_map))

    # --- stage 3: dataset synthesis
    keys = sorted(layer_ids, key=int)
    creation_config = {
        "class_to_color_map": {
            "background": "#000000",
            "printed_text": "#0000FF",
            "handwritten_text": "#FF0000",
        },
        "keys_for_class_determination": keys[:2],
        "keys_for_finegrained_segmentation": keys[-2:],
        "keys_to_merge": {},
        "segmenter_type": "black_white_handwritten_printed",
        "only_keep_overlapping": False,
        "min_class_contour_area": 2,
        "seed": 1,
    }
    config_path = tmp_path / "creation_config.json"
    config_path.write_text(json.dumps(creation_config))

    cds_args = cds.build_parser().parse_args(
        [str(ckpt_dir), str(config_path), "-n", "4", "-b", "4",
         "--num-clusters", "3"] + extra_args
    )
    cds.main(cds_args)

    image_dir = run_dir / "generated_images"
    pngs = list(image_dir.glob("**/*.png"))
    assert len(pngs) >= 4
    from PIL import Image

    with Image.open(pngs[0]) as im:
        assert im.size == (2 * SIZE, SIZE)  # side-by-side [image|mask]
    assert (image_dir / "train.json").exists()
    assert (image_dir / "val.json").exists()
    coco = json.loads((image_dir / "coco_gt.json").read_text())
    assert {"images", "annotations", "categories"} <= set(coco)
    train = json.loads((image_dir / "train.json").read_text())
    assert all("file_name" in e and "has_printed_text" in e for e in train)


def test_gray_fetch_matches_rgb_luminance():
    """--gray-fetch (1 B/px image transfer) must fetch exactly the
    luminance of the RGB path, replicated host-side to RGB."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from synthesis_in_style_tpu.models.stylegan2 import Generator
    from synthesis_in_style_tpu.utils.dataset_creation import (
        make_generate_fn,
        make_image,
    )

    gen = Generator(size=32, style_dim=32, n_mlp=2)
    variables = gen.init(
        jax.random.PRNGKey(0), [jnp.zeros((1, 32))], randomize_noise=False
    )
    z = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
    _, rgb = make_generate_fn(gen, variables)(z)
    _, gray = make_generate_fn(gen, variables, gray_fetch=True)(z)
    assert gray.shape == rgb.shape[:3] and gray.dtype == rgb.dtype
    # expected: quantize the float luminance of the RAW generator output
    raw, _ = gen.apply(variables, [z], randomize_noise=False)
    expected = np.clip(
        np.round((np.asarray(raw, np.float32).mean(-1) + 1.0) * 127.5),
        0, 255,
    )
    np.testing.assert_array_equal(np.asarray(gray, np.float32), expected)
    replicated = np.repeat(make_image(gray)[..., None], 3, axis=-1)
    assert replicated.shape == rgb.shape
