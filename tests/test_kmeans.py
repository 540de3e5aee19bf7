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
