"""LPIPS metric TRAINING — the rank-calibration side of the vendored
richzhang lib (reference Dist2LogitLayer/BCERankingLoss,
losses/lpips/networks_basic.py:116-144, and the net-lin training loop of
dist_model.py:60-170: optimize_parameters / forward_train / clamp_weights /
compute_accuracy).

The reference pipeline only *calls* the inference surface (losses/lpips.py
here), but it vendors the full training machinery; this module closes that
last parity gap TPU-natively: one jitted Adam step over 2AFC triplets
(ref, p0, p1, human judge in [0,1]) training the per-tap lin calibration
weights together with the Dist2LogitLayer ranking head, with the
reference's >=0 clamp on the lin weights after every step
(dist_model.py:126-129).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

Array = jax.Array


class Dist2LogitLayer(nn.Module):
    """(d0, d1) distances -> probability that p1 is closer (reference
    networks_basic.py:116-131: 1x1 convs over the 5-feature stack —
    distances here are per-pair scalars, so Dense == 1x1 conv)."""

    chn_mid: int = 32
    use_sigmoid: bool = True

    @nn.compact
    def __call__(self, d0: Array, d1: Array, eps: float = 0.1) -> Array:
        d0 = d0.reshape(-1, 1)
        d1 = d1.reshape(-1, 1)
        x = jnp.concatenate(
            [d0, d1, d0 - d1, d0 / (d1 + eps), d1 / (d0 + eps)], axis=1
        )
        x = nn.leaky_relu(nn.Dense(self.chn_mid)(x), 0.2)
        x = nn.leaky_relu(nn.Dense(self.chn_mid)(x), 0.2)
        x = nn.Dense(1)(x)
        if self.use_sigmoid:
            x = nn.sigmoid(x)
        return x.reshape(-1)


def bce_ranking_loss(prob: Array, judge: Array, eps: float = 1e-7) -> Array:
    """BCE between the rank head's probability and the human judgement
    mapped from [-1, 1] to [0, 1] (reference BCERankingLoss.forward,
    networks_basic.py:140-144 — its `judge` argument arrives in [-1,1])."""
    per = (judge + 1.0) / 2.0
    prob = jnp.clip(prob, eps, 1.0 - eps)
    return -jnp.mean(per * jnp.log(prob) + (1.0 - per) * jnp.log(1.0 - prob))


def compute_accuracy(d0: Array, d1: Array, judge01: Array) -> Array:
    """Fraction of pairs where the metric's ranking agrees with the human
    judgement in [0,1] (reference dist_model.py compute_accuracy)."""
    d1_lt_d0 = (d1 < d0).astype(jnp.float32)
    return jnp.mean(d1_lt_d0 * judge01 + (1.0 - d1_lt_d0) * (1.0 - judge01))


class LPIPSRankTrainer:
    """Functional 2AFC trainer for the lin calibration weights + rank head
    (reference dist_model.py initialize is_train=True + optimize_parameters).

    Trainable parameters: the per-tap lin weights of an `LPIPS` instance
    (backbone frozen, like the reference's net-lin mode with
    pnet_tune=False) and the Dist2LogitLayer. After each Adam step the lin
    weights are clamped >= 0 (reference clamp_weights, dist_model.py:126-129
    — LPIPS distances must stay nonnegative combinations).
    """

    def __init__(self, lpips, lr: float = 1e-4, beta1: float = 0.5,
                 seed: int = 0):
        self.lpips = lpips
        self.rank_net = Dist2LogitLayer()
        rank_params = self.rank_net.init(
            jax.random.PRNGKey(seed), jnp.zeros((1,)), jnp.zeros((1,))
        )["params"]
        self.params: Dict[str, Any] = {
            "lin": [jnp.asarray(w) for w in lpips.lin_weights],
            "rank": rank_params,
        }
        self.tx = optax.adam(lr, b1=beta1, b2=0.999)
        self.opt_state = self.tx.init(self.params)
        self._step = jax.jit(self._make_step())

    def _distance(self, lin: List[Array], x0: Array, x1: Array) -> Array:
        feats0 = self.lpips._features(x0)
        feats1 = self.lpips._features(x1)
        from synthesis_in_style_tpu.losses.lpips import _normalize_tensor

        total = jnp.zeros((x0.shape[0],))
        for f0, f1, w in zip(feats0, feats1, lin):
            diff = jnp.square(_normalize_tensor(f0) - _normalize_tensor(f1))
            total += jnp.mean(jnp.sum(diff * w, axis=-1), axis=(1, 2))
        return total

    def _make_step(self):
        def loss_fn(params, ref, p0, p1, judge01):
            d0 = self._distance(params["lin"], ref, p0)
            d1 = self._distance(params["lin"], ref, p1)
            prob = self.rank_net.apply(
                {"params": params["rank"]}, d0, d1
            )
            loss = bce_ranking_loss(prob, judge01 * 2.0 - 1.0)
            return loss, (d0, d1)

        def step(params, opt_state, ref, p0, p1, judge01):
            (loss, (d0, d1)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, ref, p0, p1, judge01)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            # reference clamp_weights: 1x1-conv (lin) weights >= 0
            params = dict(
                params,
                lin=[jnp.maximum(w, 0.0) for w in params["lin"]],
            )
            acc = compute_accuracy(d0, d1, judge01)
            return params, opt_state, {"loss_total": loss, "acc_r": acc}

        return step

    def train_step(self, ref, p0, p1, judge01) -> Dict[str, float]:
        """One 2AFC batch: images NHWC in [-1,1]; judge01 (B,) in [0,1]
        (fraction of humans preferring p1)."""
        self.params, self.opt_state, metrics = self._step(
            self.params, self.opt_state,
            jnp.asarray(ref), jnp.asarray(p0), jnp.asarray(p1),
            jnp.asarray(judge01, jnp.float32),
        )
        return {k: float(v) for k, v in metrics.items()}

    def apply_to_lpips(self) -> None:
        """Write the trained lin weights back into the LPIPS instance."""
        self.lpips.lin_weights = [jnp.asarray(w) for w in self.params["lin"]]

    def evaluate(self, ref, p0, p1, judge01) -> Dict[str, float]:
        d0 = self._distance(self.params["lin"], jnp.asarray(ref),
                            jnp.asarray(p0))
        d1 = self._distance(self.params["lin"], jnp.asarray(ref),
                            jnp.asarray(p1))
        return {
            "acc_r": float(
                compute_accuracy(d0, d1, jnp.asarray(judge01, jnp.float32))
            ),
            "twoafc": float(twoafc_score(np.asarray(d0), np.asarray(d1),
                                         np.asarray(judge01))),
        }


def twoafc_score(d0: np.ndarray, d1: np.ndarray, judge01: np.ndarray) -> float:
    """The 2AFC score of the LPIPS paper: expected agreement with the human
    population (same formula as compute_accuracy, kept host-side for
    evaluation tables)."""
    d1_lt_d0 = (d1 < d0).astype(np.float64)
    return float(np.mean(d1_lt_d0 * judge01 + (1 - d1_lt_d0) * (1 - judge01)))
