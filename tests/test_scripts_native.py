"""Analysis scripts + native PNG writer (reference scripts/*,
new native/fast_png.cpp)."""

import json

import numpy as np
import pytest
from PIL import Image

from synthesis_in_style_tpu.scripts.balance_segmentation_train_gt import balance_gt
from synthesis_in_style_tpu.scripts.create_stylegan_train_dataset import (
    crop_patches,
    get_content_box,
    remove_scanning_margin,
    scale_bounding_box,
)


# ---------------- dataset-prep scripts --------------------------------------

def test_crop_patches_covers_image():
    image = Image.new("RGB", (300, 520))
    patches = crop_patches(image, 256)
    assert len(patches) == 2 * 3  # ceil(300/256) * ceil(520/256)
    assert all(p.size == (256, 256) for p in patches)


def test_content_box_detects_margin():
    # white page with a dark content block inside
    page = np.full((400, 300, 3), 255, np.uint8)
    page[40:360, 30:270] = 30
    rng = np.random.default_rng(0)
    page[40:360, 30:270] += rng.integers(0, 60, (320, 240, 3)).astype(np.uint8)
    box = get_content_box(Image.fromarray(page))
    x0, y0, x1, y1 = box
    assert 0 <= x0 <= 40 and 0 <= y0 <= 50
    assert 255 <= x1 <= 300 and 345 <= y1 <= 400

    cropped = remove_scanning_margin(Image.fromarray(page))
    assert cropped.width <= 300 and cropped.height <= 400


def test_scale_bounding_box():
    assert scale_bounding_box([10, 10, 20, 20], (100, 100), (200, 400)) == [
        20, 40, 40, 80,
    ]


def test_balance_gt():
    items = (
        [{"file_name": f"a{i}", "has_x": True, "has_y": False} for i in range(10)]
        + [{"file_name": f"b{i}", "has_x": False, "has_y": True} for i in range(4)]
        + [{"file_name": f"c{i}", "has_x": True, "has_y": True} for i in range(6)]
        + [{"file_name": f"d{i}", "has_x": False, "has_y": False} for i in range(8)]
    )
    kept = balance_gt(items, seed=0)
    # smallest bucket has 4 entries; 4 buckets * 4
    assert len(kept) == 16
    buckets = {"a": 0, "b": 0, "c": 0, "d": 0}
    for item in kept:
        buckets[item["file_name"][0]] += 1
    assert all(v == 4 for v in buckets.values())


# ---------------- native PNG writer ------------------------------------------

def test_fastpng_encode_roundtrip(tmp_path):
    from synthesis_in_style_tpu.native import encode_png, get_fastpng

    if get_fastpng() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (37, 53, 3), np.uint8)
    png_bytes = encode_png(image)
    assert png_bytes is not None and png_bytes[:4] == b"\x89PNG"
    p = tmp_path / "x.png"
    p.write_bytes(png_bytes)
    decoded = np.asarray(Image.open(p))
    np.testing.assert_array_equal(decoded, image)


def test_fastpng_batch_write(tmp_path):
    from synthesis_in_style_tpu.native import get_fastpng, write_png_batch

    if get_fastpng() is None:
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(1)
    images = rng.integers(0, 255, (8, 32, 48, 3), np.uint8)
    paths = [tmp_path / f"img_{i}.png" for i in range(8)]
    assert write_png_batch(images, paths, num_threads=4)
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(np.asarray(Image.open(p)), images[i])


def test_save_generated_images_uses_native(tmp_path):
    from synthesis_in_style_tpu.utils.dataset_creation import save_generated_images

    rng = np.random.default_rng(2)
    gen = rng.integers(0, 255, (3, 16, 16, 3), np.uint8)
    masks = rng.integers(0, 255, (3, 16, 16, 3), np.uint8)
    save_generated_images(gen, masks, 0, tmp_path, 10)
    pngs = sorted(tmp_path.glob("**/*.png"))
    assert len(pngs) == 3
    with Image.open(pngs[0]) as im:
        assert im.size == (32, 16)
        np.testing.assert_array_equal(
            np.asarray(im), np.concatenate([gen[0], masks[0]], axis=1)
        )


# ---------------- analyze_latent_code helpers --------------------------------

def test_latent_analysis_blueprint(tmp_path):
    from synthesis_in_style_tpu.scripts.analyze_latent_code import (
        analyze_latents,
        analyze_noise,
        empirical_cdf,
    )

    rng = np.random.default_rng(0)
    latents = rng.normal(size=(20, 14, 8)).astype(np.float32)
    blueprint = analyze_latents(latents, tmp_path / "latents", max_dims_plotted=2)
    assert blueprint["shape"] == [14, 8]
    assert len(blueprint["per_dim_mean"]) == 8
    assert (tmp_path / "latents" / "latent_blueprint.json").exists()
    assert (tmp_path / "latents" / "latent_histogram.png").exists()

    noises = [rng.normal(size=(20, 4, 4, 1)), rng.normal(size=(20, 8, 8, 1))]
    noise_bp = analyze_noise(noises, tmp_path / "noise")
    assert len(noise_bp) == 2

    x, y = empirical_cdf(np.array([1.0, 2.0, 3.0, 4.0]))
    np.testing.assert_allclose(y, [0.25, 0.5, 0.75, 1.0])


# ---------------- offline augmentation CLI (ref utils/augment_dataset.py) ---

def test_augment_dataset_cli(tmp_path):
    from synthesis_in_style_tpu.scripts.augment_dataset import build_parser, main

    dataset_dir = tmp_path / "data"
    (dataset_dir / "sub").mkdir(parents=True)
    rng = np.random.default_rng(0)
    mask_palette = np.array([[0, 0, 0], [255, 255, 255], [255, 0, 255]], np.uint8)
    for name in ["a.png", "sub/b.png"]:
        image = rng.integers(0, 255, (64, 48, 3), dtype=np.uint8)
        mask = mask_palette[rng.integers(0, 3, (64, 48))]
        page = np.concatenate([image, mask], axis=1)
        Image.fromarray(page).save(dataset_dir / name)

    save_dir = tmp_path / "out"
    preview_dir = tmp_path / "prev"
    args = build_parser().parse_args(
        [str(dataset_dir), "-n", "2", "--save-dir", str(save_dir),
         "--preview-dir", str(preview_dir), "--workers", "2"]
    )
    main(args)

    outs = sorted(p.relative_to(save_dir).as_posix() for p in save_dir.glob("**/*.png"))
    assert outs == ["a_aug_1.png", "a_aug_2.png", "sub/b_aug_1.png", "sub/b_aug_2.png"]
    for p in save_dir.glob("**/*.png"):
        page = np.asarray(Image.open(p))
        assert page.shape == (64, 96, 3)
        # geometric ops warp the mask with nearest-neighbor: the augmented
        # mask half may only contain original palette colors (or the black
        # border fill)
        mask_half = page[:, 48:].reshape(-1, 3)
        allowed = {tuple(c) for c in mask_palette}
        assert {tuple(c) for c in np.unique(mask_half, axis=0)} <= allowed
    assert len(list(preview_dir.glob("*_preview.png"))) == 2

    # per-page seeding makes reruns deterministic
    save_dir2 = tmp_path / "out2"
    args2 = build_parser().parse_args(
        [str(dataset_dir), "-n", "2", "--save-dir", str(save_dir2), "--workers", "1"]
    )
    main(args2)
    for p in save_dir.glob("**/*.png"):
        q = save_dir2 / p.relative_to(save_dir)
        assert np.array_equal(np.asarray(Image.open(p)), np.asarray(Image.open(q)))

    # preview-only run (the headless --show): montages only, NO aug pairs
    preview_only = tmp_path / "prev_only"
    args3 = build_parser().parse_args(
        [str(dataset_dir), "-n", "2", "--preview-dir", str(preview_only),
         "--workers", "1"]
    )
    main(args3)
    written = sorted(p.name for p in preview_only.glob("**/*.png"))
    assert written == ["a_preview.png", "b_preview.png"]


def test_latent_stats_suite_writes_reference_artifact_set(tmp_path):
    """The --stats battery (reference plots_and_stats,
    scripts/analyze_latent_code.py:236-289): parallel-coordinate plots,
    Spearman heatmaps, Shapiro-Wilk maps."""
    import numpy as np

    from synthesis_in_style_tpu.scripts.analyze_latent_code import (
        latent_stats_suite,
    )

    rng = np.random.default_rng(0)
    codes = rng.normal(size=(40, 2, 8)).astype("f4")
    latent_stats_suite(codes, tmp_path, max_samples=30, max_dims=8,
                       dims_per_plot=4)
    viz = tmp_path / "visualizations"
    res = tmp_path / "test_results"
    assert (viz / "plot_a_0-4_0.png").exists()
    assert (viz / "plot_a_4-8_1.png").exists()
    assert (viz / "plot_b_0.png").exists()  # per-dim across slices
    assert (res / "correlation_c_0.png").exists()
    assert (res / "correlation_c_1.png").exists()
    for name in ("shapiro_wilk_sliced", "shapiro_wilk_per_code",
                 "shapiro_wilk_per_sample"):
        assert (res / f"{name}.png").exists()


def test_reconstructed_cdf_self_check(tmp_path):
    """Inverse-CDF resampling reproduces the source distribution (the
    --check-reconstructed-cdf mode's premise) and the overlay histogram
    renders."""
    import numpy as np

    from synthesis_in_style_tpu.scripts.analyze_latent_code import (
        create_and_save_histogram,
        inverse_cdf_sample,
    )

    rng = np.random.default_rng(1)
    data = rng.normal(2.0, 0.5, 5000).astype("f4")
    resampled = inverse_cdf_sample(data, 5000, rng)
    assert abs(resampled.mean() - data.mean()) < 0.05
    assert abs(resampled.std() - data.std()) < 0.05
    out = tmp_path / "h.png"
    create_and_save_histogram(data, out, check_reconstructed_cdf=True)
    assert out.exists() and out.stat().st_size > 0
