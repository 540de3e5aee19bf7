"""LPIPS rank-training machinery (losses/lpips_rank) — the reference's
Dist2LogitLayer/BCERankingLoss + net-lin 2AFC trainer
(losses/lpips/networks_basic.py:116-144, dist_model.py:60-170)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from synthesis_in_style_tpu.losses.lpips_rank import (
    Dist2LogitLayer,
    LPIPSRankTrainer,
    bce_ranking_loss,
    compute_accuracy,
    twoafc_score,
)

pytestmark = pytest.mark.slow  # excluded from the quick lane (-m 'not slow')


def test_dist2logit_outputs_probabilities():
    layer = Dist2LogitLayer()
    d0 = jnp.asarray([0.1, 0.9, 0.5])
    d1 = jnp.asarray([0.8, 0.2, 0.5])
    params = layer.init(jax.random.PRNGKey(0), d0, d1)
    prob = layer.apply(params, d0, d1)
    assert prob.shape == (3,)
    assert ((prob >= 0) & (prob <= 1)).all()


def test_bce_ranking_loss_prefers_agreement():
    # judge=-1 means humans preferred p0 (per=0): low prob -> low loss
    low = bce_ranking_loss(jnp.asarray([0.05]), jnp.asarray([-1.0]))
    high = bce_ranking_loss(jnp.asarray([0.95]), jnp.asarray([-1.0]))
    assert float(low) < float(high)


def test_compute_accuracy_matches_reference_formula():
    d0 = jnp.asarray([1.0, 0.1])
    d1 = jnp.asarray([0.1, 1.0])
    judge = jnp.asarray([1.0, 0.0])  # humans prefer p1, then p0
    # metric agrees on both pairs
    assert float(compute_accuracy(d0, d1, judge)) == 1.0
    assert twoafc_score(np.asarray(d0), np.asarray(d1),
                        np.asarray(judge)) == 1.0


def test_rank_trainer_learns_synthetic_judgements(recwarn):
    """On synthetic 2AFC data whose judgements follow pixel distance, a few
    steps must increase ranking accuracy and keep lin weights >= 0."""
    from synthesis_in_style_tpu.losses.lpips import LPIPS

    lp = LPIPS(net="alex", use_lin=False)  # unit lin weights, random backbone
    trainer = LPIPSRankTrainer(lp, lr=1e-3)

    rng = np.random.default_rng(0)

    def batch(n=8):
        ref = rng.uniform(-1, 1, (n, 32, 32, 3)).astype(np.float32)
        noise0 = rng.normal(0, 0.4, ref.shape).astype(np.float32)
        noise1 = rng.normal(0, 0.05, ref.shape).astype(np.float32)
        p0 = np.clip(ref + noise0, -1, 1)
        p1 = np.clip(ref + noise1, -1, 1)
        judge = np.ones((n,), np.float32)  # humans always prefer p1 (closer)
        return ref, p0, p1, judge

    m0 = trainer.evaluate(*batch())
    for _ in range(10):
        metrics = trainer.train_step(*batch())
        assert np.isfinite(metrics["loss_total"])
    m1 = trainer.evaluate(*batch())
    assert m1["acc_r"] >= m0["acc_r"] - 1e-6
    assert m1["acc_r"] > 0.5  # distances do rank the cleaner patch closer
    for w in trainer.params["lin"]:
        assert (np.asarray(w) >= 0).all()

    trainer.apply_to_lpips()
    d = lp(jnp.zeros((1, 32, 32, 3)), jnp.ones((1, 32, 32, 3)))
    assert np.isfinite(np.asarray(d)).all()
