"""Minibatch spherical k-means: starved-center reassignment, convergence
stopping, and cluster-quality A/B vs sklearn's MiniBatchKMeans on
L2-normalized blobs (the reference subclasses exactly that estimator,
spherical_kmeans.py:159)."""

import jax.numpy as jnp
import numpy as np
import pytest

from synthesis_in_style_tpu.segmentation.kmeans import (

    MiniBatchSphericalKMeans,
    _minibatch_step,
    assign_euclidean,
)

pytestmark = pytest.mark.slow  # excluded from the quick lane (-m 'not slow')



def _blobs(n_per: int, centers: np.ndarray, scale: float, seed: int = 0):
    rng = np.random.default_rng(seed)
    x = np.concatenate(
        [c + scale * rng.normal(size=(n_per, centers.shape[1])) for c in centers]
    ).astype(np.float32)
    labels = np.repeat(np.arange(len(centers)), n_per)
    perm = rng.permutation(len(x))
    return x[perm], labels[perm]


def _normalize(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_starved_center_gets_reassigned():
    """A center with zero mass must move onto a data sample when the
    reassignment step fires (reference via sklearn _mini_batch_step,
    spherical_kmeans.py:92-120) — previously dead centers stayed dead."""
    rng = np.random.default_rng(1)
    # all data concentrated around +e0; dead center antipodal at -e0 so it
    # never wins a cosine assignment
    live_dir = np.zeros(8, np.float32)
    live_dir[0] = 1.0
    batch = jnp.asarray(
        _normalize(
            live_dir + 0.05 * rng.normal(size=(256, 8))
        ).astype(np.float32)
    )
    centers = jnp.asarray(np.stack([-live_dir, live_dir]))
    counts = jnp.asarray(np.array([0.0, 500.0], np.float32))

    import jax

    new_centers, new_counts, _, _ = _minibatch_step(
        centers, counts, batch, jnp.asarray(True), jax.random.PRNGKey(0), 0.01
    )
    # the starved center is now (near) one of the batch samples
    d = np.linalg.norm(
        np.asarray(batch) - np.asarray(new_centers[0])[None], axis=1
    ).min()
    assert d < 0.2  # moved into the data (one update step may shift it a bit)
    assert float(new_counts[0]) > 0

    # without the reassignment trigger the dead center must not move
    frozen_centers, _, _, _ = _minibatch_step(
        centers, counts, batch, jnp.asarray(False), jax.random.PRNGKey(0), 0.01
    )
    np.testing.assert_array_equal(
        np.asarray(frozen_centers[0]), np.asarray(centers[0])
    )


def test_fit_recovers_all_clusters_despite_dead_init():
    """End-to-end: k-means with k=6 on 6 well-separated blobs must use all 6
    centers (reassignment rescues any starved ones)."""
    true_centers = np.eye(6, 16, dtype=np.float32) * 4
    x, _ = _blobs(400, true_centers, scale=0.05)
    km = MiniBatchSphericalKMeans(
        n_clusters=6, batch_size=256, n_epochs=10, seed=3
    ).fit(x)
    pred = km.predict(x)
    sizes = np.bincount(pred, minlength=6)
    assert (sizes > 0).all(), f"dead clusters: sizes={sizes}"


def test_fit_converges_early():
    """On easy data the EWA no-improvement rule stops well before the epoch
    cap (sklearn _mini_batch_convergence semantics)."""
    true_centers = np.eye(4, 8, dtype=np.float32)
    x, _ = _blobs(2000, true_centers, scale=0.02)
    km = MiniBatchSphericalKMeans(
        n_clusters=4, batch_size=128, n_epochs=50, seed=0
    ).fit(x)
    total_steps = 50 * (-(-len(x) // 128))
    assert 0 < km.n_steps_ < total_steps


def test_quality_parity_vs_sklearn():
    """Inertia and assignment agreement vs sklearn MiniBatchKMeans on
    L2-normalized blobs (VERDICT r1 weak #5). Label-permutation-invariant:
    compare partition agreement + relative inertia."""
    sklearn_cluster = pytest.importorskip("sklearn.cluster")

    true_centers = np.eye(5, 12, dtype=np.float32) * 3
    x, _ = _blobs(600, true_centers, scale=0.15, seed=7)
    xn = _normalize(x)

    ours = MiniBatchSphericalKMeans(
        n_clusters=5, batch_size=256, n_epochs=20, seed=0
    ).fit(x)
    ours_assign = np.asarray(
        assign_euclidean(jnp.asarray(xn), jnp.asarray(ours.cluster_centers_))
    )

    ref = sklearn_cluster.MiniBatchKMeans(
        n_clusters=5, batch_size=256, random_state=0, n_init=3
    ).fit(xn)
    ref_assign = ref.predict(xn)

    def inertia(assign, centers):
        return float(np.sum((xn - centers[assign]) ** 2))

    ours_inertia = inertia(ours_assign, _normalize(ours.cluster_centers_))
    ref_inertia = inertia(ref_assign, ref.cluster_centers_)
    # ours must be within 5% of sklearn's solution quality
    assert ours_inertia <= ref_inertia * 1.05, (ours_inertia, ref_inertia)

    # partition agreement: every pair of points co-clustered by one solution
    # is co-clustered by the other (adjusted Rand via sklearn.metrics)
    from sklearn.metrics import adjusted_rand_score

    assert adjusted_rand_score(ours_assign, ref_assign) > 0.95


def test_partial_fit_and_predict_shapes():
    rng = np.random.default_rng(0)
    km = MiniBatchSphericalKMeans(n_clusters=3, seed=1)
    for _ in range(3):
        km.partial_fit(rng.normal(size=(64, 6)).astype(np.float32))
    assert km.cluster_centers_.shape == (3, 6)
    pred = km.predict(rng.normal(size=(10, 6)).astype(np.float32))
    assert pred.shape == (10,)
    assert pred.max() < 3


def test_invalid_n_clusters_raises():
    with pytest.raises(ValueError, match="n_clusters"):
        MiniBatchSphericalKMeans(n_clusters=0)


def test_k_bucket_compile_reuse():
    """Every k in a bucket must reuse ONE compiled fit-epoch program
    (VERDICT r3 #4: the cluster-discovery CLI sweeps k=3..24 per layer and
    paid one ~10 s XLA compile per (shape, k) without padding)."""
    from synthesis_in_style_tpu.segmentation.kmeans import (
        _fit_epoch,
        _kmeanspp_init,
        assign_euclidean_bucketed,
        k_bucket_size,
    )

    assert k_bucket_size(3, 8) == 8
    assert k_bucket_size(8, 8) == 8
    assert k_bucket_size(9, 8) == 16
    assert k_bucket_size(24, 8) == 24
    assert k_bucket_size(5, 0) == 5  # disabled

    centers = np.array([[4.0, 0.0], [0.0, 4.0], [-4.0, 0.0], [0.0, -4.0],
                        [3.0, 3.0], [-3.0, 3.0], [3.0, -3.0]], np.float32)
    x, _ = _blobs(200, centers, 0.2, seed=3)

    base_fit = _fit_epoch._cache_size()
    base_init = _kmeanspp_init._cache_size()
    models = {}
    for k in (3, 5, 7, 8):  # one bucket (K_pad = 8)
        m = MiniBatchSphericalKMeans(k, batch_size=256, n_epochs=2, seed=0)
        m.fit(x)
        models[k] = m
        assert m.cluster_centers_.shape == (k, 2)
    assert _fit_epoch._cache_size() - base_fit == 1
    assert _kmeanspp_init._cache_size() - base_init == 1

    # bucketed prediction shares one program across the bucket too
    base_assign = assign_euclidean._cache_size()
    for k, m in models.items():
        labels = np.asarray(
            assign_euclidean_bucketed(jnp.asarray(x), m.cluster_centers_)
        )
        assert labels.max() < k
    assert assign_euclidean._cache_size() - base_assign == 1


def test_k_bucket_quality_matches_unpadded():
    """Padding must not change fit quality: bucketed and unpadded fits land
    within a few percent inertia of each other on separable blobs."""
    from synthesis_in_style_tpu.segmentation.kmeans import _spherical_inertia

    centers = np.array([[4.0, 0.0, 0], [0.0, 4.0, 0], [-4.0, 0.0, 1],
                        [0.0, -4.0, 1], [2.0, 2.0, -2]], np.float32)
    x, _ = _blobs(300, centers, 0.15, seed=5)
    xn = jnp.asarray(_normalize(x))

    inertias = {}
    for bucket in (8, 0):
        m = MiniBatchSphericalKMeans(
            5, batch_size=256, n_epochs=3, seed=0, k_bucket=bucket
        )
        m.fit(x)
        inertias[bucket] = float(
            _spherical_inertia(xn, jnp.asarray(_normalize(m.cluster_centers_)))
        )
    assert inertias[8] <= inertias[0] * 1.05 + 1e-6
    assert inertias[0] <= inertias[8] * 1.05 + 1e-6
