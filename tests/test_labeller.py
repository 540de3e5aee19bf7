"""Semantic labeller tests: artifact loading, label adjustment, saved
merged_classes json (the contract with the cluster segmenters), and a live
HTTP roundtrip (reference semantic_labeller/app.py)."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from synthesis_in_style_tpu.labeller.app import Labeller, make_handler, render_index

CLASS_COLORS = {"background": "#000000", "printed_text": "#0000FF",
                "handwritten_text": "#FF0000"}
K = 3


@pytest.fixture()
def labeller(tmp_path):
    # two layers at 8px and 16px, 2 sample images
    rng = np.random.default_rng(0)
    labels = {
        "8": rng.integers(0, K, (2, 8, 8)).astype(np.int32),
        "12": rng.integers(0, K, (2, 16, 16)).astype(np.int32),
    }
    arrays = {
        key: rng.integers(0, 255, (2, 3, lab.shape[1], lab.shape[2]), np.uint8)
        for key, lab in labels.items()
    }
    (tmp_path / "cluster_labels").mkdir()
    (tmp_path / "cluster_arrays").mkdir()
    np.savez(tmp_path / "cluster_labels" / f"{K}.npz", **labels)
    np.savez(tmp_path / "cluster_arrays" / f"{K}.npz", **arrays)
    colors_path = tmp_path / "colors.json"
    colors_path.write_text(json.dumps(CLASS_COLORS))
    return Labeller(tmp_path, K, colors_path, max_size=16)


def test_labeller_roundtrip_save(labeller):
    base = len(labeller.color_map) - len(labeller.class_colors)
    # assign cluster under (0, 0) of layer 0 to class printed_text (base+1)
    labeller.adjust_label(0, 0, {
        "position": {"x": 0, "y": 0}, "mode": "label", "color": base + 1,
    })
    out = labeller.save({})
    saved = json.loads(out.read_text())
    assert set(saved.keys()) == {"8", "12"}
    cluster_id = int(labeller.labels[0][0][0, 0])
    assert saved["8"][str(cluster_id)] == "printed_text"
    # unlabelled clusters keep their integer identity
    other = (cluster_id + 1) % K
    assert saved["8"][str(other)] == other

    # resuming from the saved file reproduces the same label_map
    resumed = Labeller(labeller.base_dir, K, labeller.base_dir / "colors.json",
                       max_size=16)
    assert resumed.label_map[0][cluster_id] == base + 1


def test_labeller_images(labeller):
    img = labeller.get_image(0, 0)
    assert img.size == (16, 16)
    original = labeller.get_image(0, 1, original=True)
    assert original.size == (16, 16)


def test_labeller_http_roundtrip(labeller):
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(labeller))
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        base_url = f"http://127.0.0.1:{port}"
        index = urllib.request.urlopen(f"{base_url}/").read().decode()
        assert "Semantic Class Labeller" in index
        png = urllib.request.urlopen(f"{base_url}/image/0/0").read()
        assert png[:4] == b"\x89PNG"
        # the shipped UI appends a ?t=<now> cache-buster to every image URL
        png = urllib.request.urlopen(f"{base_url}/image/0/0?t=123456").read()
        assert png[:4] == b"\x89PNG"
        req = urllib.request.Request(
            f"{base_url}/label/0/0",
            data=json.dumps({
                "position": {"x": 1, "y": 1}, "mode": "label",
                "color": len(labeller.color_map) - 1,
            }).encode(),
            method="POST",
        )
        resp = json.loads(urllib.request.urlopen(req).read())
        assert resp == {"sub_image_id": 0}
        req = urllib.request.Request(
            f"{base_url}/save", data=json.dumps({"file_name": "out.json"}).encode(),
            method="POST",
        )
        urllib.request.urlopen(req)
        assert (labeller.base_dir / "out.json").exists()
    finally:
        server.shutdown()


def test_render_index_contains_palette(labeller):
    html = render_index(labeller)
    assert "printed_text" in html
    assert str(labeller.num_images) in html


def test_labeller_loads_reference_era_catalog_pickle(tmp_path):
    """A reference-era semantic_segmentation dir (catalogs/<k>.pkl +
    cluster_arrays/<k>.npz, NO cluster_labels) loads directly: per-layer
    labels come from the pickled estimators' labels_ (reference
    semantic_labeller/app.py:99-119)."""
    import pickle
    import sys
    import types

    # build a synthetic legacy pickle whose classes claim the reference
    # module paths, exactly as reference-era pickles do
    mod_fc = types.ModuleType("segmentation.gan_local_edit.factor_catalog")
    mod_sk = types.ModuleType("segmentation.gan_local_edit.spherical_kmeans")

    class FactorCatalog:
        pass

    class MiniBatchSphericalKMeans:
        pass

    FactorCatalog.__module__ = mod_fc.__name__
    FactorCatalog.__qualname__ = "FactorCatalog"
    MiniBatchSphericalKMeans.__module__ = mod_sk.__name__
    MiniBatchSphericalKMeans.__qualname__ = "MiniBatchSphericalKMeans"
    mod_fc.FactorCatalog = FactorCatalog
    mod_sk.MiniBatchSphericalKMeans = MiniBatchSphericalKMeans
    pkg_root = types.ModuleType("segmentation")
    pkg_mid = types.ModuleType("segmentation.gan_local_edit")
    registered = {
        "segmentation": pkg_root,
        "segmentation.gan_local_edit": pkg_mid,
        mod_fc.__name__: mod_fc,
        mod_sk.__name__: mod_sk,
    }
    saved_modules = {k: sys.modules.get(k) for k in registered}
    sys.modules.update(registered)
    try:
        rng = np.random.default_rng(1)
        shapes = {"8": 8, "12": 16}
        catalogs = {}
        arrays = {}
        for layer, hw in shapes.items():
            est = MiniBatchSphericalKMeans()
            est.cluster_centers_ = rng.normal(size=(K, 4)).astype(np.float32)
            est.labels_ = rng.integers(0, K, (2 * hw * hw)).astype(np.int64)
            cat = FactorCatalog()
            cat._factorization = est
            cat.annotations = {}
            catalogs[layer] = cat
            arrays[layer] = rng.integers(0, 255, (2, 3, hw, hw), np.uint8)
        catalogs["id_to_size_map"] = {0: 8, 1: 12}

        (tmp_path / "catalogs").mkdir()
        (tmp_path / "cluster_arrays").mkdir()
        with (tmp_path / "catalogs" / f"{K}.pkl").open("wb") as f:
            pickle.dump(catalogs, f)
        np.savez(tmp_path / "cluster_arrays" / f"{K}.npz", **arrays)
        colors_path = tmp_path / "colors.json"
        colors_path.write_text(json.dumps(CLASS_COLORS))
    finally:
        for name, orig in saved_modules.items():
            if orig is None:
                del sys.modules[name]
            else:
                sys.modules[name] = orig

    lab = Labeller(tmp_path, K, colors_path, max_size=16)
    assert lab.layer_ids == ["8", "12"]
    assert lab.labels[0].shape == (2, 8, 8)
    assert lab.labels[1].shape == (2, 16, 16)
    # labels round-trip the estimators' labels_
    np.testing.assert_array_equal(
        lab.labels[1].ravel(),
        np.asarray(catalogs["12"]._factorization.labels_),
    )
    img = lab.get_image(0, 0)
    assert img.size == (16, 16)
