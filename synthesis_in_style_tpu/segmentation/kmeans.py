"""Minibatch spherical k-means in JAX.

Capability parity with the reference's sklearn-0.24-private-API subclass
(/root/reference/stylegan_code_finder/segmentation/gan_local_edit/spherical_kmeans.py):
L2-normalize the data and the centers at every step, assign by cosine
similarity (== euclidean on normalized vectors), update centers with
per-center 1/count learning rates, periodically reassign starved centers to
random batch samples (spherical_kmeans.py:92-120 via sklearn's
reassignment_ratio), and stop early when the EWA of the batch inertia makes
no improvement for `max_no_improvement` consecutive batches (sklearn 0.24
_mini_batch_convergence semantics, which the reference inherits).

TPU-first design: one epoch = one `lax.scan` over minibatches, entirely on
device — the assignment is one (B, D) @ (D, K) matmul on the MXU, the update
a one-hot segment-sum, and reassignment a masked gather. The scan emits
per-batch (inertia, squared-diff, centers, counts) traces so the host can
apply the exact per-batch stopping rule with ONE device sync per epoch
instead of one per batch (the relay makes per-batch syncs ~1000x the step
cost).

Prediction (`assign`) matches FactorCatalog.pairwise_distance
(factor_catalog.py:47-62): plain euclidean argmin against the stored centers
WITHOUT normalizing the query vectors.

Compile amortization (k-bucketing): the cluster-discovery CLI sweeps
k=3..24 per layer (reference create_semantic_segmentation.py:181-187), and
each distinct (N_points, dim, k) shape costs an XLA compile (~10 s over the
dev relay vs ~0.4 s warm — round-3 kmeans_fit_bench). The fitted centers
therefore live PADDED to a static bucket `K_pad` (next multiple of
`k_bucket`, default 8) with the real `k` a *traced* scalar: dead rows are
masked out of assignment/reassignment and never move, so one compiled
program serves every k in the bucket and the whole grid pays
O(distinct shapes x buckets) compiles instead of O(shapes x ks).
Trajectories are invariant to the bucket choice for the deterministic path;
the starved-center RNG draws depend on K_pad (documented, quality-gated by
the sklearn A/B tests).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    return x / jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True) + eps)


def _valid_mask(k_pad: int, k_valid) -> jnp.ndarray:
    """(K_pad,) bool — True for the first `k_valid` (traced) center rows."""
    return jnp.arange(k_pad) < k_valid


def k_bucket_size(k: int, quantum: int) -> int:
    """Static padded center count for a real k (next multiple of quantum)."""
    if quantum <= 0:
        return k
    return max(quantum, -(-k // quantum) * quantum)


@partial(jax.jit, static_argnames=("k_pad",))
def _init_centers(
    x: jnp.ndarray, key: jax.Array, k_pad: int, k_valid
) -> jnp.ndarray:
    idx = jax.random.choice(key, x.shape[0], (k_pad,), replace=False)
    return jnp.where(
        _valid_mask(k_pad, k_valid)[:, None], _l2_normalize(x[idx]), 0.0
    )


@partial(jax.jit, static_argnames=("k_pad",))
def _kmeanspp_init(
    x: jnp.ndarray, key: jax.Array, k_pad: int, k_valid
) -> jnp.ndarray:
    """k-means++ D^2-sampling init on (already normalized) samples — the
    init the reference inherits from sklearn MiniBatchKMeans (init size and
    best-of-n_init selection happen in fit). Rows >= k_valid stay zero; the
    per-step RNG draws are identical for every k, so one compile serves the
    whole k grid of a bucket."""
    m = x.shape[0]
    k0, key = jax.random.split(key)
    first = x[jax.random.randint(k0, (), 0, m)]
    centers0 = jnp.zeros((k_pad, x.shape[1]), x.dtype).at[0].set(first)
    d2_0 = jnp.sum(jnp.square(x - first), axis=1)

    def body(carry, i):
        centers, d2, key = carry
        key, kc = jax.random.split(key)
        idx = jax.random.categorical(kc, jnp.log(jnp.maximum(d2, 1e-12)))
        c = x[idx]
        live = i < k_valid
        centers = jnp.where(live, centers.at[i].set(c), centers)
        d2 = jnp.where(
            live, jnp.minimum(d2, jnp.sum(jnp.square(x - c), axis=1)), d2
        )
        return (centers, d2, key), None

    (centers, _, _), _ = lax.scan(
        body, (centers0, d2_0, key), jnp.arange(1, k_pad)
    )
    return centers


@jax.jit
def _spherical_inertia(
    x: jnp.ndarray, centers: jnp.ndarray, valid: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    sims = x @ centers.T
    if valid is not None:
        sims = jnp.where(valid[None, :], sims, -jnp.inf)
    return jnp.sum(2.0 - 2.0 * jnp.max(sims, axis=1))


def _reassign_starved(
    centers: jnp.ndarray,  # (K_pad, D)
    counts: jnp.ndarray,  # (K_pad,)
    xb: jnp.ndarray,  # (B, D) normalized batch
    key: jax.Array,
    reassignment_ratio: float,
    valid: Optional[jnp.ndarray] = None,  # (K_pad,) bool
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Move centers whose accumulated weight is < ratio * max(weight) onto
    random batch samples; reset their counts to the minimum surviving count
    (sklearn 0.24 _mini_batch_step reassignment, inherited by the reference
    spherical_kmeans.py:92-120). At most floor(B/2) centers move per call.
    Padded (dead) rows never reassign and never occupy cap slots."""
    k = centers.shape[0]
    to_reassign = counts < reassignment_ratio * jnp.max(counts)
    rankable_counts = counts
    if valid is not None:
        to_reassign = jnp.logical_and(to_reassign, valid)
        rankable_counts = jnp.where(valid, counts, jnp.inf)
    # cap: keep only the lowest-count centers if more than B/2 are starved
    cap = xb.shape[0] // 2
    rank = jnp.argsort(jnp.argsort(rankable_counts))  # rank 0 = smallest
    to_reassign = jnp.logical_and(to_reassign, rank < cap)

    new_idx = jax.random.choice(
        key, xb.shape[0], (k,), replace=k > xb.shape[0]
    )
    centers = jnp.where(to_reassign[:, None], xb[new_idx], centers)
    # reset counts "but don't reset them too small to avoid instant
    # reassignment" — sklearn uses min over the non-reassigned centers
    survivors = to_reassign if valid is None else jnp.logical_or(
        to_reassign, jnp.logical_not(valid)
    )
    surviving_min = jnp.min(jnp.where(survivors, jnp.inf, counts))
    surviving_min = jnp.where(jnp.isfinite(surviving_min), surviving_min, 0.0)
    counts = jnp.where(to_reassign, surviving_min.astype(counts.dtype), counts)
    return centers, counts


@jax.jit
def _minibatch_step(
    centers: jnp.ndarray,  # (K_pad, D), unit norm (dead rows zero)
    counts: jnp.ndarray,  # (K_pad,)
    batch: jnp.ndarray,  # (B, D)
    do_reassign: jnp.ndarray,  # () bool
    key: jax.Array,
    reassignment_ratio: float,
    valid: Optional[jnp.ndarray] = None,  # (K_pad,) bool
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One sklearn-0.24-semantics minibatch step: assign -> (reassign
    starved) -> incremental per-center mean -> renormalize. Returns
    (centers, counts, batch_inertia, squared_center_diff)."""
    xb = _l2_normalize(batch)
    sims = xb @ centers.T  # cosine similarity
    if valid is not None:
        sims = jnp.where(valid[None, :], sims, -jnp.inf)
    assign = jnp.argmax(sims, axis=1)
    # inertia on normalized vectors: ||x - c||^2 = 2 - 2 * cos_sim
    inertia = jnp.sum(2.0 - 2.0 * jnp.max(sims, axis=1))

    re_centers, re_counts = _reassign_starved(
        centers, counts, xb, key, reassignment_ratio, valid
    )
    centers = jnp.where(do_reassign, re_centers, centers)
    counts = jnp.where(do_reassign, re_counts, counts)
    old_centers = centers

    onehot = jax.nn.one_hot(assign, centers.shape[0], dtype=xb.dtype)  # (B, K)
    batch_counts = jnp.sum(onehot, axis=0)  # (K,)
    batch_sums = onehot.T @ xb  # (K, D)
    new_counts = counts + batch_counts
    # incremental mean then renormalize — same direction as sklearn's
    # (center * old_count + batch_sum) followed by normalize
    safe_counts = jnp.maximum(new_counts, 1.0)
    updated = centers + (batch_sums - batch_counts[:, None] * centers) / safe_counts[:, None]
    updated = _l2_normalize(updated)
    # empty centers stay put (sklearn skips wsum == 0)
    centers = jnp.where(batch_counts[:, None] > 0, updated, centers)
    squared_diff = jnp.sum(jnp.square(centers - old_centers))
    return centers, new_counts, inertia, squared_diff


@partial(jax.jit, static_argnames=("bs", "reassign_every"))
def _fit_epoch(
    x: jnp.ndarray,
    perm: jnp.ndarray,  # (steps * bs,) sample indices
    centers: jnp.ndarray,  # (K_pad, D)
    counts: jnp.ndarray,  # (K_pad,)
    key: jax.Array,
    step_offset: jnp.ndarray,  # () int32, global batch counter
    reassignment_ratio: float,
    k_valid,  # () int32, real cluster count (<= K_pad)
    *,
    bs: int,
    reassign_every: int,
):
    """One epoch as a device-side scan; emits per-batch traces for the
    host-side convergence rule."""
    steps = perm.shape[0] // bs
    valid = _valid_mask(centers.shape[0], k_valid)

    def body(carry, s):
        centers, counts = carry
        idx = lax.dynamic_slice(perm, (s * bs,), (bs,))
        batch = x[idx]
        g = step_offset + s
        # sklearn-0.24 cadence (reference spherical_kmeans.py:292-293):
        # (iter + 1) % (10 + int(counts.min())) == 0 — the interval GROWS as
        # counts accumulate, so reassignment tapers off late in a long fit
        # (min over LIVE centers; dead padded rows stay at count 0)
        live_min = jnp.min(jnp.where(valid, counts, jnp.inf))
        interval = reassign_every + jnp.floor(live_min).astype(jnp.int32)
        do_reassign = jnp.logical_and(
            reassignment_ratio > 0, (g + 1) % interval == 0
        )
        centers, counts, inertia, sq_diff = _minibatch_step(
            centers, counts, batch, do_reassign,
            jax.random.fold_in(key, s), reassignment_ratio, valid,
        )
        return (centers, counts), (inertia, sq_diff, centers, counts)

    (centers, counts), traces = lax.scan(
        body, (centers, counts), jnp.arange(steps)
    )
    return centers, counts, traces


@jax.jit
def assign_euclidean(
    x: jnp.ndarray,
    centers: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """argmin_k ||x - c_k||^2 via one matmul (reference pairwise_distance,
    factor_catalog.py:47-62 — raw x, stored centers). With `valid`, padded
    dead center rows never win (k-bucketed compile reuse)."""
    # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2 ; ||x||^2 is constant per row
    scores = -2.0 * (x @ centers.T) + jnp.sum(jnp.square(centers), axis=1)[None, :]
    if valid is not None:
        scores = jnp.where(valid[None, :], scores, jnp.inf)
    return jnp.argmin(scores, axis=1)


def assign_euclidean_bucketed(
    x: jnp.ndarray, centers, k_bucket: int = 8
) -> jnp.ndarray:
    """assign_euclidean with the centers padded to the k bucket, so every k
    in a bucket shares one compiled assignment program (module docstring)."""
    centers = np.asarray(centers)
    k, d = centers.shape
    k_pad = k_bucket_size(k, k_bucket)
    centers_p = np.zeros((k_pad, d), centers.dtype)
    centers_p[:k] = centers
    return assign_euclidean(
        jnp.asarray(x), jnp.asarray(centers_p), _valid_mask(k_pad, jnp.int32(k))
    )


class MiniBatchSphericalKMeans:
    """Functional-core, object-shell k-means estimator.

    `n_epochs` is a cap, not a fixed schedule: fit stops early when the
    exponentially-weighted batch inertia stops improving for
    `max_no_improvement` consecutive batches or (with `tol` > 0) when the
    EWA-smoothed per-batch center movement falls below tol * mean feature
    variance — the sklearn 0.24 MiniBatchKMeans convergence rule
    (_mini_batch_convergence + _tolerance) the reference inherits;
    iteration 0 is ignored, as sklearn does. `reassign_every` is the BASE
    of the growing reassignment interval `base + int(min(counts))`
    (reference spherical_kmeans.py:292-293).
    """

    def __init__(
        self,
        n_clusters: int,
        batch_size: int = 16384,
        n_epochs: int = 3,
        seed: int = 0,
        reassignment_ratio: float = 0.01,
        reassign_every: int = 10,
        max_no_improvement: int = 10,
        tol: float = 0.0,
        n_init: int = 3,
        k_bucket: int = 8,
    ):
        if n_clusters < 1:
            raise ValueError(f"n_clusters must be >= 1, got {n_clusters}")
        self.n_clusters = n_clusters
        self.batch_size = batch_size
        self.n_epochs = n_epochs
        self.seed = seed
        self.n_init = n_init
        self.reassignment_ratio = reassignment_ratio
        self.reassign_every = reassign_every
        self.max_no_improvement = max_no_improvement
        self.tol = tol
        # centers are fitted padded to this static bucket so one compiled
        # program serves every k in the bucket (module docstring); 0
        # disables padding
        self.k_bucket = k_bucket
        self.cluster_centers_: Optional[np.ndarray] = None
        self._counts: Optional[np.ndarray] = None
        self.n_steps_: int = 0

    @property
    def _k_pad(self) -> int:
        return k_bucket_size(self.n_clusters, self.k_bucket)

    def fit(self, x) -> "MiniBatchSphericalKMeans":
        x = jnp.asarray(x)
        n = x.shape[0]
        key = jax.random.PRNGKey(self.seed)
        bs = min(self.batch_size, n)

        # k-means++ on a 3*batch_size subsample, best of n_init candidates
        # by inertia on that subsample (sklearn MiniBatchKMeans init
        # protocol, inherited by the reference)
        k_sub, k_init, key = jax.random.split(key, 3)
        init_size = min(3 * bs, n)
        sub = _l2_normalize(
            x[jax.random.choice(k_sub, n, (init_size,), replace=False)]
        )
        k_pad = self._k_pad
        k_valid = jnp.int32(self.n_clusters)
        valid = _valid_mask(k_pad, k_valid)
        centers = None
        best_inertia = None
        for trial in range(max(1, self.n_init)):
            cand = _kmeanspp_init(
                sub, jax.random.fold_in(k_init, trial), k_pad, k_valid
            )
            # normalize live rows only (dead rows stay zero)
            cand = jnp.where(valid[:, None], _l2_normalize(cand), 0.0)
            cand_inertia = float(_spherical_inertia(sub, cand, valid))
            if best_inertia is None or cand_inertia < best_inertia:
                best_inertia = cand_inertia
                centers = cand
        counts = jnp.zeros((k_pad,), jnp.float32)
        # ceil so the permutation tail is never dropped; the last batch wraps
        # to the head of the SAME permutation to keep the batch shape static
        # (a handful of head samples count twice in that epoch)
        steps_per_epoch = -(-n // bs)

        # host-side EWA convergence state (sklearn 0.24
        # _mini_batch_convergence, applied per-batch from the epoch traces):
        # iteration 0 is IGNORED (inertia from initialization), tol is
        # compared against the EWA-smoothed per-batch center movement, and —
        # like sklearn's `_tolerance` — tol is scaled by the mean per-feature
        # variance of the (normalized) data so the same tol value behaves
        # consistently across feature scales
        alpha = min(float(bs) * 2.0 / (n + 1), 1.0)
        tol_scaled = 0.0
        if self.tol > 0:
            tol_scaled = float(
                jnp.mean(jnp.var(_l2_normalize(x), axis=0))
            ) * self.tol
        ewa_inertia: Optional[float] = None
        ewa_diff: Optional[float] = None
        ewa_min: Optional[float] = None
        no_improvement = 0
        global_step = 0

        for epoch in range(self.n_epochs):
            key, k_perm, k_steps = jax.random.split(key, 3)
            perm = jax.random.permutation(k_perm, n)
            perm = jnp.concatenate(
                [perm, perm[: steps_per_epoch * bs - n]]
            )
            centers, counts, traces = _fit_epoch(
                x, perm, centers, counts, k_steps,
                jnp.int32(global_step), self.reassignment_ratio, k_valid,
                bs=bs, reassign_every=self.reassign_every,
            )
            inertias, sq_diffs, centers_tr, counts_tr = (
                np.asarray(traces[0]), np.asarray(traces[1]),
                traces[2], traces[3],
            )
            # exact per-batch stopping rule, applied from the epoch trace
            for s in range(steps_per_epoch):
                is_first = global_step == 0
                global_step += 1
                if is_first:
                    continue  # sklearn ignores iteration 0
                batch_inertia = float(inertias[s]) / bs
                batch_diff = float(sq_diffs[s]) / bs
                if ewa_inertia is None:
                    ewa_inertia = batch_inertia
                    ewa_diff = batch_diff
                else:
                    ewa_inertia = ewa_inertia * (1 - alpha) + batch_inertia * alpha
                    ewa_diff = ewa_diff * (1 - alpha) + batch_diff * alpha
                if self.tol > 0 and ewa_diff <= tol_scaled:
                    self._finish(centers_tr[s], counts_tr[s], global_step)
                    return self
                if ewa_min is None or ewa_inertia < ewa_min:
                    ewa_min = ewa_inertia
                    no_improvement = 0
                else:
                    no_improvement += 1
                if (
                    self.max_no_improvement is not None
                    and no_improvement >= self.max_no_improvement
                ):
                    self._finish(centers_tr[s], counts_tr[s], global_step)
                    return self
        self._finish(centers, counts, global_step)
        return self

    def _finish(self, centers, counts, n_steps: int) -> None:
        # strip the dead padded rows — stored centers are always (k, D)
        self.cluster_centers_ = np.asarray(centers)[: self.n_clusters]
        self._counts = np.asarray(counts)[: self.n_clusters]
        self.n_steps_ = n_steps

    def partial_fit(self, batch) -> "MiniBatchSphericalKMeans":
        batch = jnp.asarray(batch)
        k_pad = self._k_pad
        k = self.n_clusters
        if self.cluster_centers_ is None:
            key = jax.random.PRNGKey(self.seed)
            self.cluster_centers_ = np.asarray(
                _init_centers(batch, key, k_pad, jnp.int32(k))
            )[:k]
            self._counts = np.zeros((k,), np.float32)
        if self._counts is None:
            # centers restored from disk without counts (legacy catalogs):
            # resume with zero counts = full learning rate on the next batch
            self._counts = np.zeros((k,), np.float32)
        self.n_steps_ += 1
        # reference partial_fit cadence (spherical_kmeans.py:363-366):
        # stochastic, p = 1 / (10 * (1 + counts.min())) — tapers off as
        # counts build up
        rs = np.random.RandomState(self.seed + self.n_steps_)
        do_reassign = jnp.asarray(
            self.reassignment_ratio > 0
            and rs.randint(
                self.reassign_every * (1 + int(self._counts.min()))
            ) == 0
        )
        centers_p = np.zeros((k_pad, batch.shape[1]), np.float32)
        centers_p[:k] = self.cluster_centers_
        counts_p = np.zeros((k_pad,), np.float32)
        counts_p[:k] = self._counts
        centers, counts, _, _ = _minibatch_step(
            jnp.asarray(centers_p),
            jnp.asarray(counts_p),
            batch,
            do_reassign,
            jax.random.fold_in(jax.random.PRNGKey(self.seed), self.n_steps_),
            self.reassignment_ratio,
            _valid_mask(k_pad, jnp.int32(k)),
        )
        self.cluster_centers_ = np.asarray(centers)[:k]
        self._counts = np.asarray(counts)[:k]
        return self

    def predict(self, x) -> np.ndarray:
        assert self.cluster_centers_ is not None, "fit first"
        k_pad = self._k_pad
        k = self.n_clusters
        centers_p = np.zeros((k_pad, self.cluster_centers_.shape[1]),
                             self.cluster_centers_.dtype)
        centers_p[:k] = self.cluster_centers_
        return np.asarray(
            assign_euclidean(
                jnp.asarray(x), jnp.asarray(centers_p),
                _valid_mask(k_pad, jnp.int32(k)),
            )
        )
