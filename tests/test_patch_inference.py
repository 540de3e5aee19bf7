"""Port of reference tests/test_patch_cropping.py against the pure tiling
functions, plus assembly, metrics, and a train-CLI → patch-inference
end-to-end test."""

import json
import math

import numpy as np
import pytest
from PIL import Image

from synthesis_in_style_tpu.segmentation.analysis_segmenter import (
    calculate_bboxes_for_patches,
    resolve_patch_overlap,
)

PATCH_SIZES = [10, 64, 256]
IMAGE_SIZE_FACTORS = [
    (2, 1), (2, 2), (2.5, 3), (3.7, 4.2), (2, 8.5), (50.3, 100.7),
]
FACTOR_IDS = [f"size_factor {int(t[0])}x{int(t[1])}" for t in IMAGE_SIZE_FACTORS]


@pytest.fixture(params=PATCH_SIZES, ids=[f"patch_size {s}" for s in PATCH_SIZES])
def patch_size(request):
    return request.param


@pytest.mark.parametrize(
    "overlap",
    [(-1, 0.0), (500, 0.0), (0, -1.0), (0, 1.0), (2, 0.9)],
    ids=["abs too low", "abs too high", "factor too low", "factor too high",
         "both specified"],
)
def test_wrong_overlap_specification(overlap):
    with pytest.raises(AssertionError):
        resolve_patch_overlap(10, patch_overlap=overlap[0],
                              patch_overlap_factor=overlap[1])


@pytest.mark.parametrize(
    "image_size_factor",
    [(1, 1), (2, 1), (1, 2), (3, 3), (1.5, 1), (1.5, 1.5), (4.5, 4.5), (5.7, 6.1)],
)
def test_no_specific_overlap(patch_size, image_size_factor):
    image_size = (int(image_size_factor[0] * patch_size),
                  int(image_size_factor[1] * patch_size))
    patches = calculate_bboxes_for_patches(*image_size, patch_size, None)
    assert len(patches) == math.ceil(image_size_factor[0]) * math.ceil(
        image_size_factor[1]
    )


@pytest.mark.parametrize("factor", [0.25, 0.3, 0.5, 0.6, 0.75, 0.9])
@pytest.mark.parametrize("image_size_factor", IMAGE_SIZE_FACTORS, ids=FACTOR_IDS)
def test_overlap_factor_calculation(patch_size, factor, image_size_factor):
    overlap = resolve_patch_overlap(patch_size, patch_overlap_factor=factor)
    image_size = (int(image_size_factor[0] * patch_size),
                  int(image_size_factor[1] * patch_size))
    patches = calculate_bboxes_for_patches(*image_size, patch_size, overlap)
    assert patches[0][2] - patches[1][0] == overlap
    first_box_second_row = [box for box in patches if box[1] > 0][0]
    assert patches[0][3] - first_box_second_row[1] == overlap


@pytest.mark.parametrize("absolute", [1, 3, 5, 6, 7, 9])
@pytest.mark.parametrize("image_size_factor", IMAGE_SIZE_FACTORS, ids=FACTOR_IDS)
def test_absolute_overlap_calculation(patch_size, absolute, image_size_factor):
    overlap = resolve_patch_overlap(patch_size, patch_overlap=absolute)
    image_size = (int(image_size_factor[0] * patch_size),
                  int(image_size_factor[1] * patch_size))
    patches = calculate_bboxes_for_patches(*image_size, patch_size, overlap)
    assert patches[0][2] - patches[1][0] == overlap
    first_box_second_row = [box for box in patches if box[1] > 0][0]
    assert patches[0][3] - first_box_second_row[1] == overlap


@pytest.mark.parametrize("image_size_factor", IMAGE_SIZE_FACTORS, ids=FACTOR_IDS)
def test_automatic_patch_boundary_coverage(patch_size, image_size_factor):
    image_size = (int(image_size_factor[0] * patch_size),
                  int(image_size_factor[1] * patch_size))
    patches = calculate_bboxes_for_patches(*image_size, patch_size, None)
    if (image_size[0] % patch_size) == 0:
        assert patches[-1][2] == image_size[0]
    else:
        assert patches[-1][2] > image_size[0]
    if (image_size[1] % patch_size) == 0:
        assert patches[-1][3] == image_size[1]
    else:
        assert patches[-1][3] > image_size[1]


# ---------------- metrics ---------------------------------------------------

def test_confusion_matrix_and_metrics():
    from synthesis_in_style_tpu.evaluation.metrics import (
        calculate_confusion_matrix,
        calculate_metric,
    )

    gt = np.array([[0, 0, 1], [1, 2, 2]])
    pred = np.array([[0, 1, 1], [1, 2, 0]])
    cm = calculate_confusion_matrix(gt, pred, 3)
    expected = np.array([[1, 1, 0], [0, 2, 0], [1, 0, 1]], np.float32)
    np.testing.assert_array_equal(cm, expected)

    scores = calculate_metric(cm, ["background", "printed_text", "handwritten_text"],
                              "iou")
    assert scores["background"]["score"] == pytest.approx(1 / 3)
    assert scores["printed_text"]["score"] == pytest.approx(2 / 3)
    assert scores["handwritten_text"]["score"] == pytest.approx(1 / 2)
    weighted = (2 / 6) * (1 / 3) + (2 / 6) * (2 / 3) + (2 / 6) * (1 / 2)
    assert scores["weighted_avg"]["score"] == pytest.approx(weighted)


def test_metrics_absent_class_scores_one():
    from synthesis_in_style_tpu.evaluation.metrics import (
        calculate_confusion_matrix,
        calculate_metric,
    )

    gt = np.zeros((4, 4), np.int32)
    pred = np.zeros((4, 4), np.int32)
    cm = calculate_confusion_matrix(gt, pred, 3)
    for metric in ("dice", "iou", "precision", "recall"):
        scores = calculate_metric(cm, ["background", "printed_text", "x_text"],
                                  metric)
        assert scores["printed_text"]["score"] == 1.0
        assert scores["weighted_text_avg"]["score"] == 1.0


# ---------------- train CLI -> inference end-to-end -------------------------

@pytest.mark.slow  # >20s on the 1-core host; full lane only
def test_train_cli_and_patch_inference(tmp_path):
    from synthesis_in_style_tpu.cli import train as train_cli
    from synthesis_in_style_tpu.segmentation.analysis_segmenter import (
        VotingAssemblySegmenter,
    )
    from synthesis_in_style_tpu.utils.checkpoint import latest_snapshot

    class_to_color = {
        "background": "#000000",
        "printed_text": "#0000FF",
        "handwritten_text": "#FF0000",
    }
    color_map_path = tmp_path / "colors.json"
    color_map_path.write_text(json.dumps(class_to_color))

    # tiny dataset of 4 side-by-side pairs
    rng = np.random.default_rng(0)
    files = []
    for i in range(4):
        img = rng.integers(0, 255, (32, 32, 3), np.uint8)
        mask = np.zeros((32, 32, 3), np.uint8)
        mask[8:24, 8:24] = (0, 0, 255)
        Image.fromarray(np.concatenate([img, mask], axis=1)).save(
            tmp_path / f"im_{i}.png"
        )
        files.append({"file_name": f"im_{i}.png"})
    (tmp_path / "train.json").write_text(json.dumps(files))

    config = {
        "network": "DocUFCN",
        "dataset": "wpi",
        "num_classes": 3,
        "image_size": 32,
        "batch_size": 2,
        "num_augmentations": 1,
        "num_workers": 1,
        "lr": 1e-3,
        "beta1": 0.9,
        "beta2": 0.999,
        "weight_decay": 0.0,
        "end_lr": 1e-5,
        "max_iter": 3,
        "snapshot_save_iter": 3,
        "image_save_iter": 3,
        "log_iter": 1,
        "display_size": 2,
        "class_weights": [1.0, 1.0, 1.0],
        "epochs": 1,
    }
    import yaml

    config_path = tmp_path / "config.yaml"
    config_path.write_text(yaml.dump(config))

    log_dir = tmp_path / "logs"
    args = train_cli.build_parser().parse_args(
        [str(config_path), "--images", str(tmp_path / "train.json"),
         "--class-to-color-map", str(color_map_path), "--debug"]
    )
    args.log_dir = str(log_dir)
    train_cli.main(args)

    snapshot = latest_snapshot(log_dir / "checkpoints")
    assert snapshot is not None
    assert (log_dir / "log.jsonl").exists()
    assert (log_dir / "config" / "config.json").exists()
    images = list((log_dir / "images").glob("*.png"))
    assert images, "image plotter produced no output"

    # patch inference over a larger page with the trained snapshot
    segmenter = VotingAssemblySegmenter(
        snapshot,
        class_to_color_map=class_to_color,
        batch_size=2,
        patch_overlap_factor=0.5,
        original_config_path=config_path,
    )
    page = Image.fromarray(rng.integers(0, 255, (50, 70, 3), np.uint8))
    assembled = segmenter.segment_image(page)
    assert assembled.shape == (50, 70, 3)
    assert np.all(assembled >= 0) and np.all(assembled <= 1)
    colored = segmenter.prediction_to_color_image(assembled)
    assert colored.size == (70, 50)

    # hyperparameter injection (reference set_hyperparams)
    segmenter.set_hyperparams(
        {"min_confidence": 0.9, "min_contour_area": 10, "patch_overlap": (4, 0.0)}
    )
    assert segmenter.segmenter_config.min_confidence == 0.9
    assembled2 = segmenter.segment_image(page)
    assert assembled2.shape == (50, 70, 3)
