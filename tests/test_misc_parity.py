"""Small parity pieces: COCODataset collate, legacy autoencoder checkpoint
conversion."""

import json

import numpy as np
from PIL import Image

from synthesis_in_style_tpu.data.coco_dataset import COCODataset
from synthesis_in_style_tpu.utils.checkpoint import convert_autoencoder_checkpoint


def test_coco_dataset_variable_length_annotations(tmp_path):
    rng = np.random.default_rng(0)
    images = []
    annotations = []
    for i in range(3):
        pair = rng.integers(0, 255, (16, 32, 3), np.uint8)
        Image.fromarray(pair).save(tmp_path / f"im_{i}.png")
        images.append({"id": i, "file_name": f"im_{i}.png", "width": 16,
                       "height": 16})
    annotations = [
        {"id": 0, "image_id": 0, "category_id": 1},
        {"id": 1, "image_id": 0, "category_id": 2},
        {"id": 2, "image_id": 2, "category_id": 1},
    ]
    coco = {"images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "printed_text"}]}
    path = tmp_path / "coco_gt.json"
    path.write_text(json.dumps(coco))

    dataset = COCODataset(path, root=tmp_path, image_size=16)
    assert len(dataset) == 3
    item = dataset[0]
    assert item["images"].shape == (16, 16, 3)
    assert len(item["annotations"]) == 2
    assert len(dataset[1]["annotations"]) == 0

    batch = COCODataset.collate_func([dataset[0], dataset[1], dataset[2]])
    assert batch["images"].shape == (3, 16, 16, 3)
    assert [len(a) for a in batch["annotations"]] == [2, 0, 1]
    np.testing.assert_array_equal(batch["image_id"], [0, 1, 2])


def test_convert_autoencoder_checkpoint():
    w = np.ones(3)
    checkpoint = {
        "autoencoder": {
            "module.encoder.conv.weight": w,
            "module.decoder.style.1.weight": w * 2,
            "module.other.bias": w * 3,
        }
    }
    converted = convert_autoencoder_checkpoint(checkpoint)
    assert "encoder" in converted and "decoder" in converted
    np.testing.assert_array_equal(converted["encoder"]["conv.weight"], w)
    np.testing.assert_array_equal(
        converted["decoder"]["style.1.weight"], w * 2
    )
    # DDP prefix stripped in the flattened autoencoder dict
    assert "encoder.conv.weight" in converted["autoencoder"]
    assert "other.bias" in converted["autoencoder"]
    # idempotent: converting again must change nothing
    import copy

    before = copy.deepcopy(converted)
    again = convert_autoencoder_checkpoint(converted)
    assert set(again) == set(before)
    for section in before:
        assert set(again[section]) == set(before[section])
        for key in before[section]:
            np.testing.assert_array_equal(again[section][key], before[section][key])
