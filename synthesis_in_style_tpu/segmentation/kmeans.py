"""Minibatch spherical k-means in JAX.

Capability parity with the reference's sklearn-0.24-private-API subclass
(/root/reference/stylegan_code_finder/segmentation/gan_local_edit/spherical_kmeans.py):
L2-normalize the data and the centers at every step, assign by cosine
similarity (== euclidean on normalized vectors), update centers with
per-center 1/count learning rates. Fit runs entirely on device: the
assignment is one (B, D) @ (D, K) matmul on the MXU; the update is a one-hot
segment-sum, so a full pass over N*H*W pixel features never leaves HBM.

Prediction (`assign`) matches FactorCatalog.pairwise_distance
(factor_catalog.py:47-62): plain euclidean argmin against the stored centers
WITHOUT normalizing the query vectors.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    return x / jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True) + eps)


@partial(jax.jit, static_argnames=("k",))
def _init_centers(x: jnp.ndarray, key: jax.Array, k: int) -> jnp.ndarray:
    idx = jax.random.choice(key, x.shape[0], (k,), replace=False)
    return _l2_normalize(x[idx])


@jax.jit
def _minibatch_step(
    centers: jnp.ndarray,  # (K, D), unit norm
    counts: jnp.ndarray,  # (K,)
    batch: jnp.ndarray,  # (B, D)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    xb = _l2_normalize(batch)
    sims = xb @ centers.T  # cosine similarity
    assign = jnp.argmax(sims, axis=1)
    onehot = jax.nn.one_hot(assign, centers.shape[0], dtype=xb.dtype)  # (B, K)
    batch_counts = jnp.sum(onehot, axis=0)  # (K,)
    batch_sums = onehot.T @ xb  # (K, D)
    new_counts = counts + batch_counts
    # incremental mean: c <- c + (sum_x - n_b * c) / count, skip empty centers
    safe_counts = jnp.maximum(new_counts, 1.0)
    centers = centers + (batch_sums - batch_counts[:, None] * centers) / safe_counts[:, None]
    centers = _l2_normalize(centers)
    return centers, new_counts


@jax.jit
def assign_euclidean(x: jnp.ndarray, centers: jnp.ndarray) -> jnp.ndarray:
    """argmin_k ||x - c_k||^2 via one matmul (reference pairwise_distance,
    factor_catalog.py:47-62 — raw x, stored centers)."""
    # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; ||x||^2 is constant per row
    scores = -2.0 * (x @ centers.T) + jnp.sum(jnp.square(centers), axis=1)[None, :]
    return jnp.argmin(scores, axis=1)


class MiniBatchSphericalKMeans:
    """Functional-core, object-shell k-means estimator."""

    def __init__(self, n_clusters: int, batch_size: int = 16384, n_epochs: int = 3,
                 seed: int = 0):
        self.n_clusters = n_clusters
        self.batch_size = batch_size
        self.n_epochs = n_epochs
        self.seed = seed
        self.cluster_centers_: Optional[np.ndarray] = None
        self._counts: Optional[np.ndarray] = None

    def fit(self, x) -> "MiniBatchSphericalKMeans":
        x = jnp.asarray(x)
        n = x.shape[0]
        key = jax.random.PRNGKey(self.seed)
        k_init, key = jax.random.split(key)
        centers = _init_centers(x, k_init, self.n_clusters)
        counts = jnp.zeros((self.n_clusters,), x.dtype)

        bs = min(self.batch_size, n)
        # ceil so the permutation tail is never dropped; the last batch wraps
        # to the head of the SAME permutation to keep the batch shape static
        # (a handful of head samples count twice in that epoch)
        steps_per_epoch = -(-n // bs)
        for epoch in range(self.n_epochs):
            key, k_perm = jax.random.split(key)
            perm = jax.random.permutation(k_perm, n)
            for s in range(steps_per_epoch):
                idx = jnp.arange(s * bs, (s + 1) * bs) % n
                batch = x[perm[idx]]
                centers, counts = _minibatch_step(centers, counts, batch)
        self.cluster_centers_ = np.asarray(centers)
        self._counts = np.asarray(counts)
        return self

    def partial_fit(self, batch) -> "MiniBatchSphericalKMeans":
        batch = jnp.asarray(batch)
        if self.cluster_centers_ is None:
            key = jax.random.PRNGKey(self.seed)
            self.cluster_centers_ = np.asarray(
                _init_centers(batch, key, self.n_clusters)
            )
            self._counts = np.zeros((self.n_clusters,), np.float32)
        if self._counts is None:
            # centers restored from disk without counts (legacy catalogs):
            # resume with zero counts = full learning rate on the next batch
            self._counts = np.zeros((self.n_clusters,), np.float32)
        centers, counts = _minibatch_step(
            jnp.asarray(self.cluster_centers_), jnp.asarray(self._counts), batch
        )
        self.cluster_centers_ = np.asarray(centers)
        self._counts = np.asarray(counts)
        return self

    def predict(self, x) -> np.ndarray:
        assert self.cluster_centers_ is not None, "fit first"
        return np.asarray(
            assign_euclidean(jnp.asarray(x), jnp.asarray(self.cluster_centers_))
        )
