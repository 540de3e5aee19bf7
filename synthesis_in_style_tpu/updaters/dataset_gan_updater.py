"""DatasetGAN ensemble training step (reference
updater/dataset_gan_updater.py:7-33): every ensemble member trains on the
SAME batch with its own optimizer.

TPU-first: the per-member loop becomes one `jax.vmap` over the stacked
(member-leading) parameter/optimizer pytrees — N members advance in a single
jitted step."""

from __future__ import annotations

from typing import Any, Callable, Dict

import flax
import jax
import jax.numpy as jnp
import optax

from synthesis_in_style_tpu.core.updater import Updater
from synthesis_in_style_tpu.losses.segmentation import cross_entropy_loss
from synthesis_in_style_tpu.models.pixel_classifier import (
    PixelClassifier,
    PixelEnsembleClassifier,
)

Array = jax.Array


@flax.struct.dataclass
class EnsembleTrainState:
    variables: Any  # stacked {params, batch_stats}, leading axis = member
    opt_state: Any  # stacked
    step: Array


def create_ensemble_train_state(
    ensemble: PixelEnsembleClassifier, tx: optax.GradientTransformation
) -> EnsembleTrainState:
    opt_state = jax.vmap(tx.init)(ensemble.variables["params"])
    return EnsembleTrainState(
        variables=ensemble.variables,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
    )


def make_ensemble_train_step(
    model: PixelClassifier,
    tx: optax.GradientTransformation,
    donate: bool = True,
) -> Callable:
    """One jitted step advancing ALL members on the same batch (reference
    update_core :16-24)."""

    def member_step(variables, opt_state, activations, labels):
        def loss_fn(params):
            out, new_state = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                activations,
                train=True,
                mutable=["batch_stats"],
            )
            return cross_entropy_loss(out, labels), new_state["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"]
        )
        updates, opt_state = tx.update(grads, opt_state, variables["params"])
        params = optax.apply_updates(variables["params"], updates)
        return {"params": params, "batch_stats": new_bs}, opt_state, loss

    def train_step(state: EnsembleTrainState, batch: Dict[str, Array]):
        variables, opt_state, losses = jax.vmap(
            member_step, in_axes=(0, 0, None, None)
        )(state.variables, state.opt_state, batch["activations"],
          batch["label"])
        state = state.replace(
            variables=variables, opt_state=opt_state, step=state.step + 1
        )
        return state, losses

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


class DatasetGANUpdater(Updater):
    """Host loop (reference :7-33); `reset()` regenerates activations every
    epoch for generation-backed datasets (reference :26-33)."""

    def __init__(
        self,
        ensemble: PixelEnsembleClassifier,
        tx: optax.GradientTransformation,
        iterators,
        dataset=None,
        seed: int = 0,
    ):
        super().__init__(iterators, seed=seed)
        self.ensemble = ensemble
        self.dataset = dataset
        self.state = create_ensemble_train_state(ensemble, tx)
        self.train_step = make_ensemble_train_step(ensemble.model, tx)
        self._last_epoch = 0

    def update_core(self):
        it = self.iterators["feature_vectors"]
        epoch = getattr(it, "epoch", 0)
        if self.dataset is not None and int(epoch) > self._last_epoch:
            self._last_epoch = int(epoch)
            self.reset()
        batch = {k: jnp.asarray(v) for k, v in next(it).items()}
        self.state, losses = self.train_step(self.state, batch)
        self.ensemble.variables = self.state.variables
        self.report(
            {
                f"CrossEntropyLoss_network_{i}": losses[i]
                for i in range(losses.shape[0])
            },
            prefix="loss",
        )

    def reset(self):
        reset_fn = getattr(self.dataset, "reset_dataset", None)
        if reset_fn is not None:
            reset_fn()
