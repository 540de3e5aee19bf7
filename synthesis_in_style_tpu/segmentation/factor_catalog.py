"""FactorCatalog — per-layer k-means over generator feature maps.

Capability parity with the reference
(/root/reference/stylegan_code_finder/segmentation/gan_local_edit/factor_catalog.py),
NHWC, with a neutral npz on-disk format instead of pickled sklearn estimators
(SURVEY §7 "pickle catalog compat"): `save_catalogs` / `load_catalogs` write
`catalogs/<k>.npz` holding centers + counts + annotations per layer, and
`convert_legacy_catalog` re-exports a reference `catalogs/<k>.pkl` (pickled
sklearn estimators) into that format.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional, Union

import jax.numpy as jnp
import numpy as np

from synthesis_in_style_tpu.segmentation.kmeans import (
    MiniBatchSphericalKMeans,
    assign_euclidean,
    assign_euclidean_bucketed,
)
from synthesis_in_style_tpu.segmentation.ptutils import partial_flat


class FactorCatalog:
    def __init__(self, k: int, seed: int = 0, **kmeans_kwargs):
        self.k = k
        self._kmeans = MiniBatchSphericalKMeans(n_clusters=k, seed=seed, **kmeans_kwargs)
        self.annotations: Dict[str, list] = {}

    @property
    def cluster_centers(self) -> Optional[np.ndarray]:
        return self._kmeans.cluster_centers_

    def fit_predict(self, x) -> jnp.ndarray:
        """Fit on (N,H,W,C) activations; return (N,H,W) integer labels."""
        flat, _ = partial_flat(x)
        self._kmeans.fit(flat)
        labels = assign_euclidean_bucketed(
            flat, self._kmeans.cluster_centers_, self._kmeans.k_bucket
        )
        n, h, w = x.shape[0], x.shape[1], x.shape[2]
        return labels.reshape(n, h, w)

    def predict(self, x) -> jnp.ndarray:
        """(N,H,W,C) -> (N,H,W) labels by euclidean argmin (reference
        factor_catalog.py:69-75)."""
        assert self.cluster_centers is not None, "fit or load first"
        flat, _ = partial_flat(x)
        labels = assign_euclidean_bucketed(
            flat, self.cluster_centers, self._kmeans.k_bucket
        )
        return labels.reshape(x.shape[0], x.shape[1], x.shape[2])


def save_catalogs(
    catalogs: Dict[str, FactorCatalog], path: Union[str, Path]
) -> None:
    """Write `{layer_id: FactorCatalog}` to one npz + annotations json."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = {}
    annotations = {}
    for layer_id, catalog in catalogs.items():
        assert catalog.cluster_centers is not None
        arrays[f"centers_{layer_id}"] = catalog.cluster_centers
        if catalog._kmeans._counts is not None:
            arrays[f"counts_{layer_id}"] = catalog._kmeans._counts
        annotations[layer_id] = catalog.annotations
    np.savez(path, **arrays)
    with open(path.with_suffix(".annotations.json"), "w") as f:
        json.dump(annotations, f)


def load_catalogs(path: Union[str, Path]) -> Dict[str, FactorCatalog]:
    path = Path(path)
    data = np.load(path)
    ann_path = path.with_suffix(".annotations.json")
    annotations = json.loads(ann_path.read_text()) if ann_path.exists() else {}
    catalogs = {}
    for name in data.files:
        if not name.startswith("centers_"):
            continue
        layer_id = name[len("centers_") :]
        centers = data[name]
        catalog = FactorCatalog(k=centers.shape[0])
        catalog._kmeans.cluster_centers_ = centers
        if f"counts_{layer_id}" in data.files:
            catalog._kmeans._counts = data[f"counts_{layer_id}"]
        catalog.annotations = annotations.get(layer_id, {})
        catalogs[layer_id] = catalog
    return catalogs


def load_legacy_pickle(pkl_path: Union[str, Path]) -> Dict:
    """Unpickle a reference `catalogs/<k>.pkl` under module shims for the
    module paths reference pickles carry (`gan_local_edit.*` for legacy ones
    and `segmentation.gan_local_edit.*` for current ones — reference
    base_cluster_based_dataset_segmenter.py:48-53,
    semantic_labeller/app.py:103-112). Returns the raw {layer_id: catalog}
    dict (plus `id_to_size_map` if present). Requires the pickle to be
    loadable (torch + sklearn present, which this image has)."""
    import pickle
    import sys
    import types

    modules = {}
    for root in ("gan_local_edit", "segmentation.gan_local_edit"):
        for leaf in ("", ".spherical_kmeans", ".factor_catalog", ".ptutils"):
            name = root + leaf
            parts = name.split(".")
            for d in range(1, len(parts) + 1):
                p = ".".join(parts[:d])
                if p not in modules and p not in sys.modules:
                    modules[p] = types.ModuleType(p)

    class _LegacyKMeans:  # minimal unpickle target
        pass

    class _LegacyCatalog:
        pass

    class _LegacyStore:
        pass

    for name, mod in modules.items():
        if name.endswith("spherical_kmeans"):
            mod.MiniBatchSphericalKMeans = _LegacyKMeans
        elif name.endswith("factor_catalog"):
            mod.FactorCatalog = _LegacyCatalog
        elif name.endswith("ptutils"):
            mod.MultiResolutionStore = _LegacyStore
        sys.modules.setdefault(name, mod)
    # link children onto parents for `from x import y`-style pickles
    for name in list(modules):
        if "." in name:
            parent, leaf = name.rsplit(".", 1)
            setattr(sys.modules[parent], leaf, sys.modules[name])

    with open(pkl_path, "rb") as f:
        return pickle.load(f)


def convert_legacy_catalog(
    pkl_path: Union[str, Path], out_path: Union[str, Path]
) -> Dict[str, FactorCatalog]:
    """Convert a reference `catalogs/<k>.pkl` (pickled sklearn estimators,
    loaded under a module shim like base_cluster_based_dataset_segmenter.py:48-53)
    to the neutral npz format."""
    legacy = load_legacy_pickle(pkl_path)
    legacy.pop("id_to_size_map", None)

    catalogs: Dict[str, FactorCatalog] = {}
    for layer_id, legacy_catalog in legacy.items():
        est = getattr(legacy_catalog, "_factorization", legacy_catalog)
        centers = np.asarray(est.cluster_centers_)
        catalog = FactorCatalog(k=centers.shape[0])
        catalog._kmeans.cluster_centers_ = centers
        catalog.annotations = dict(getattr(legacy_catalog, "annotations", {}))
        catalogs[str(layer_id)] = catalog
    save_catalogs(catalogs, out_path)
    return catalogs
