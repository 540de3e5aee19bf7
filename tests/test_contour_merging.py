"""Port of the reference contour-merge property tests
(reference tests/test_merge_contours.py) against the pure contour functions,
plus an end-to-end cluster-based dataset segmenter test on synthetic
catalogs/activations."""

import json
from collections import defaultdict

import cv2
import numpy as np
import pytest
from PIL import Image, ImageDraw

from synthesis_in_style_tpu.segmentation.contours import (
    _rasterize,
    merge_contours_of_same_class_from_different_images,
    merge_contours_of_same_class_from_same_image,
    merge_two_contours_if_overlapping,
)


def contour_from_polygon(polygon):
    x_max, y_max = np.asarray(polygon).max(axis=0)
    img = Image.new("L", (int(x_max) + 1, int(y_max) + 1))
    draw = ImageDraw.Draw(img)
    draw.polygon(polygon, fill=255)
    contour = cv2.findContours(
        np.asarray(img), cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE
    )[0][0]
    return contour


def _format_input(input_polygons):
    contour_dict = {}
    for i, polygons_for_sub_image in enumerate(input_polygons):
        contour_dict[str(i)] = {
            "printed_text": [
                [contour_from_polygon(p) for p in polygons_for_sub_image]
            ]
        }
    return contour_dict


def _format_result(result):
    if result[0] is None and result[1] is None:
        return {False: [None], True: [None]}
    return {
        False: [[contour_from_polygon(p) for p in result[0] + result[1]]],
        True: [[contour_from_polygon(p) for p in result[0]]],
    }


def _results_equal(contours_a, contours_b) -> bool:
    if contours_a is None and contours_b is None:
        return True
    lens_a = sorted(len(c) for c in contours_a)
    lens_b = sorted(len(c) for c in contours_b)
    if lens_a != lens_b:
        return False
    contours_a = sorted(contours_a, key=lambda x: tuple(x.sum(axis=0)[0]))
    contours_b = sorted(contours_b, key=lambda x: tuple(x.sum(axis=0)[0]))
    for a, b in zip(contours_a, contours_b):
        images = _rasterize([a, b])
        if not np.array_equal(images[0], images[1]):
            return False
    return True


# ---------------- overlap detection ----------------------------------------

@pytest.mark.parametrize(
    "polygons",
    [([(5, 5), (15, 5), (5, 15)], [(5, 20), (20, 5), (20, 20)])],
)
def test_overlap_determination_no_overlap(polygons):
    contours = [contour_from_polygon(p) for p in polygons]
    assert merge_two_contours_if_overlapping(*contours) is None


@pytest.mark.parametrize(
    "polygons",
    [
        ([(40, 40), (5, 40), (40, 5)], [(30, 30), (25, 30), (30, 25)]),
        ([(20, 20), (5, 20), (20, 5)], [(15, 15), (15, 35), (35, 15)]),
    ],
)
def test_overlap_determination_overlap(polygons):
    contours = [contour_from_polygon(p) for p in polygons]
    result = merge_two_contours_if_overlapping(*contours)
    assert result is not None
    assert len(result) == 1


# ---------------- multi-sub-image merging -----------------------------------

INPUT_CONTOURS_TWO_SUB_IMAGES = [
    [
        [(0, 0), (10, 0), (10, 10), (0, 10)],
        [(20, 20), (30, 20), (30, 25), (20, 25)],
        [(105, 105), (115, 105), (105, 115)],
        [(200, 200), (210, 200), (210, 210), (200, 210)],
    ],
    [
        [(5, 5), (15, 5), (15, 15), (5, 15)],
        [(0, 40), (40, 40), (40, 50), (0, 50)],
        [(105, 120), (120, 105), (120, 120)],
        [(203, 203), (208, 203), (208, 208), (203, 208)],
    ],
]

RESULTING_CONTOURS_TWO_SUB_IMAGES = [
    [
        [(0, 0), (10, 0), (10, 5), (15, 5), (15, 15), (5, 15), (5, 10), (0, 10)],
        [(200, 200), (210, 200), (210, 210), (200, 210)],
    ],
    [
        [(20, 20), (30, 20), (30, 25), (20, 25)],
        [(0, 40), (40, 40), (40, 50), (0, 50)],
        [(105, 105), (115, 105), (105, 115)],
        [(105, 120), (120, 105), (120, 120)],
    ],
]

INPUT_CONTOURS_THREE_SUB_IMAGES = [
    [
        [(130, 145), (140, 145), (140, 160), (130, 160)],
        [(200, 200), (210, 200), (210, 220), (200, 220)],
        [(300, 310), (315, 310), (315, 315), (300, 315)],
        [(500, 500), (505, 500), (505, 505), (500, 505)],
        [(750, 740), (770, 740), (770, 760), (750, 760)],
    ],
    [
        [(100, 100), (120, 100), (120, 140), (100, 140)],
        [(138, 110), (150, 110), (150, 163), (138, 163)],
        [(205, 207), (215, 207), (215, 221), (205, 221)],
        [(410, 444), (418, 444), (418, 477), (410, 477)],
        [(500, 500), (505, 500), (505, 505), (500, 505)],
        [(600, 600), (605, 600), (605, 605), (600, 605)],
    ],
    [
        [(115, 130), (135, 130), (135, 150), (115, 150)],
        [(306, 312), (317, 312), (317, 318), (306, 318)],
        [(404, 420), (414, 420), (414, 469), (404, 469)],
        [(808, 888), (888, 888), (888, 898), (808, 898)],
    ],
]

RESULTING_CONTOURS_THREE_SUB_IMAGES = [
    [
        [(100, 100), (120, 100), (120, 130), (135, 130), (135, 145), (138, 145),
         (138, 110), (150, 110), (150, 163), (138, 163), (138, 160), (130, 160),
         (130, 150), (115, 150), (115, 140), (100, 140)],
        [(200, 200), (210, 200), (210, 207), (215, 207), (215, 221), (205, 221),
         (205, 220), (200, 220)],
        [(300, 310), (315, 310), (315, 312), (317, 312), (317, 318), (306, 318),
         (306, 315), (300, 315)],
        [(404, 420), (414, 420), (414, 444), (418, 444), (418, 477), (410, 477),
         (410, 469), (404, 469)],
        [(500, 500), (505, 500), (505, 505), (500, 505)],
    ],
    [
        [(600, 600), (605, 600), (605, 605), (600, 605)],
        [(750, 740), (770, 740), (770, 760), (750, 760)],
        [(808, 888), (888, 888), (888, 898), (808, 898)],
    ],
]

INPUT_CONTOURS_ONE_SUB_IMAGE_EMPTY = [
    [],
    [
        [(5, 5), (15, 5), (15, 15), (5, 15)],
        [(0, 40), (40, 40), (40, 50), (0, 50)],
    ],
]

RESULTING_CONTOURS_ONE_SUB_IMAGE_EMPTY = [
    [
        [(5, 5), (15, 5), (15, 15), (5, 15)],
        [(0, 40), (40, 40), (40, 50), (0, 50)],
    ],
    [],
]

INPUT_BOXES_ALL_SUB_IMAGES_EMPTY = [[], []]
RESULTING_BOXES_ALL_SUB_IMAGES_EMPTY = [None, None]

INPUT_CONTOURS_NO_OVERLAP = [
    [[(100, 100), (120, 100), (120, 140), (100, 140)]],
    [[(404, 420), (414, 420), (414, 469), (404, 469)]],
    [[(808, 888), (888, 888), (888, 898), (808, 898)]],
]


@pytest.fixture(
    params=[
        (INPUT_CONTOURS_TWO_SUB_IMAGES, RESULTING_CONTOURS_TWO_SUB_IMAGES),
        (INPUT_CONTOURS_THREE_SUB_IMAGES, RESULTING_CONTOURS_THREE_SUB_IMAGES),
        (INPUT_CONTOURS_ONE_SUB_IMAGE_EMPTY, RESULTING_CONTOURS_ONE_SUB_IMAGE_EMPTY),
        (INPUT_BOXES_ALL_SUB_IMAGES_EMPTY, RESULTING_BOXES_ALL_SUB_IMAGES_EMPTY),
    ],
    ids=["two sub-images", "three sub-images", "one sub-image none",
         "all sub-images none"],
)
def contours(request):
    return _format_input(request.param[0]), _format_result(request.param[1])


@pytest.mark.parametrize("only_keep_overlapping", [True, False],
                         ids=["only keep overlapping", "keep all"])
def test_merging_multiple_sub_images(contours, only_keep_overlapping):
    input_contours, resulting_contours = contours
    result = resulting_contours[only_keep_overlapping][0]
    merged = merge_contours_of_same_class_from_different_images(
        input_contours, 1, only_keep_overlapping, ("printed_text",)
    )["printed_text"][0]
    if result is None:
        assert merged is None
    else:
        assert len(merged) == len(result)
        assert _results_equal(result, merged)


@pytest.mark.parametrize("num_sub_images", [2, 3],
                         ids=["two sub-images", "three sub-images"])
def test_no_overlap(num_sub_images):
    input_contours = _format_input(INPUT_CONTOURS_NO_OVERLAP[:num_sub_images])
    merged = merge_contours_of_same_class_from_different_images(
        input_contours, 1, True, ("printed_text",)
    )["printed_text"][0]
    assert merged is None


@pytest.fixture(
    params=[
        (INPUT_CONTOURS_TWO_SUB_IMAGES, RESULTING_CONTOURS_TWO_SUB_IMAGES),
        (INPUT_CONTOURS_THREE_SUB_IMAGES, RESULTING_CONTOURS_THREE_SUB_IMAGES),
    ],
    ids=["two sub-images", "three sub-images"],
)
def contours_with_multiple_batches(request):
    input_contours = _format_input(request.param[0])
    for v in input_contours.values():
        v["printed_text"].append([c + 10 for c in v["printed_text"][0]])
    resulting_contours = _format_result(request.param[1])
    for k, v in resulting_contours.items():
        resulting_contours[k].append([c + 10 for c in v[0]])
    return input_contours, resulting_contours


@pytest.mark.parametrize("only_keep_overlapping", [True, False],
                         ids=["only keep overlapping", "keep all"])
def test_merging_with_multiple_batches(only_keep_overlapping,
                                       contours_with_multiple_batches):
    input_contours, resulting_contours = contours_with_multiple_batches
    result = resulting_contours[only_keep_overlapping]
    batch_size = len(result)
    merged = merge_contours_of_same_class_from_different_images(
        input_contours, batch_size, only_keep_overlapping, ("printed_text",)
    )["printed_text"]
    for i in range(batch_size):
        assert _results_equal(result[i], merged[i])


@pytest.fixture(
    params=[
        (INPUT_CONTOURS_TWO_SUB_IMAGES, RESULTING_CONTOURS_TWO_SUB_IMAGES),
        (INPUT_CONTOURS_THREE_SUB_IMAGES, RESULTING_CONTOURS_THREE_SUB_IMAGES),
    ]
)
def single_sub_image_contours(request):
    input_contours = _format_input(request.param[0])
    merged_input = defaultdict(list)
    merged_input["printed_text"].append([])
    for v in input_contours.values():
        merged_input["printed_text"][0].extend(v["printed_text"][0])
    return merged_input, _format_result(request.param[1])


def test_merging_single_sub_image(single_sub_image_contours):
    input_boxes, resulting_boxes = single_sub_image_contours
    merged = merge_contours_of_same_class_from_same_image(input_boxes)
    assert _results_equal(merged["printed_text"][0], resulting_boxes[False][0])


# ---------------- end-to-end synthetic segmenter ----------------------------

def test_black_white_segmenter_end_to_end(tmp_path):
    import jax.numpy as jnp

    from synthesis_in_style_tpu.segmentation.dataset_segmenter import (
        BlackWhiteHandwrittenPrintedTextDatasetSegmenter,
    )
    from synthesis_in_style_tpu.segmentation.factor_catalog import (
        FactorCatalog,
        save_catalogs,
    )

    image_size = 32
    feat_dim = 4
    num_clusters = 3
    # orthogonal centers: cluster c == one-hot direction c
    centers = np.eye(num_clusters, feat_dim).astype(np.float32)

    catalogs = {}
    for layer in ["8", "9", "12", "13"]:
        cat = FactorCatalog(k=num_clusters)
        cat._kmeans.cluster_centers_ = centers
        catalogs[layer] = cat
    save_catalogs(catalogs, tmp_path / "catalogs" / f"{num_clusters}.npz")

    label_map = {
        layer: {"0": "background", "1": "printed_text", "2": "handwritten_text"}
        for layer in ["8", "9", "12", "13"]
    }
    (tmp_path / f"merged_classes_{num_clusters}.json").write_text(
        json.dumps(label_map)
    )

    segmenter = BlackWhiteHandwrittenPrintedTextDatasetSegmenter(
        tmp_path,
        image_size,
        {
            "background": "#000000",
            "printed_text": "#0000FF",
            "handwritten_text": "#FF0000",
        },
        keys_for_class_determination=["8", "9"],
        keys_for_finegrained_segmentation=["12", "13"],
        num_clusters=num_clusters,
        min_class_contour_area=4,
        only_keep_overlapping=False,
        keys_to_merge={},
    )

    def make_activation(res, cluster_image):
        """(H, W) int cluster ids -> (1, res, res, feat_dim) activations
        nearest the matching centers."""
        feats = centers[cluster_image]  # (H, W, feat)
        return jnp.asarray(feats[None])

    cluster_img = np.zeros((image_size, image_size), np.int64)
    cluster_img[4:20, 4:20] = 1  # printed text block
    small = cluster_img[::2, ::2]  # 16x16 version for coarse layers

    activations = {
        8: make_activation(16, small),
        9: make_activation(16, small),
        12: make_activation(32, cluster_img),
        13: make_activation(32, cluster_img),
    }

    masks, drop_ids = segmenter.create_segmentation_image(activations)
    assert masks.shape == (1, image_size, image_size, 3)
    assert drop_ids == []
    # the text block is painted in the printed_text color
    assert (masks[0, 6:18, 6:18] == np.array([0, 0, 255])).all()
    # the far background stays background-colored
    assert (masks[0, 26:, 26:] == np.array([0, 0, 0])).all()
