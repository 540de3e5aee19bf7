"""Autoencoder training steps — encoder-only updates against a frozen
generator decoder.

Capability parity with the reference
(/root/reference/stylegan_code_finder/updater/autoencoder_updater.py:12-68:
per-image-summed MSE + LPIPS reconstruction under `UpdateDisabler(decoder)`;
updater/autoencoder_discriminator_updater.py:12-121: the same plus an
adversarial term with a discriminator trained on reconstructions, R1 every
16 steps).

Functional re-design: the decoder freeze is an optax `masked` transform over
the autoencoder's parameter tree (models.autoencoder.encoder_param_mask) —
no requires_grad mutation; the per-iteration logic is jitted step functions
over one state pytree."""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import optax

from synthesis_in_style_tpu.core.updater import Updater
from synthesis_in_style_tpu.losses.gan import d_logistic_loss, g_nonsaturating_loss, r1_update
from synthesis_in_style_tpu.models.autoencoder import encoder_param_mask

Array = jax.Array


@flax.struct.dataclass
class AETrainState:
    params: Any
    batch_stats: Any
    noises: Any  # generator noise buffers ("noises" collection)
    opt_state: Any
    step: Array
    d_params: Any = None
    d_opt: Any = None


def masked_encoder_tx(
    base_tx: optax.GradientTransformation, params
) -> optax.GradientTransformation:
    """Update only encoder params; decoder updates are zeroed (reference
    UpdateDisabler(decoder) + trainable_parameters(),
    autoencoder_updater.py:61)."""

    def label_fn(p):
        return jax.tree_util.tree_map(
            lambda flag: "train" if flag else "freeze",
            encoder_param_mask(p),
        )

    return optax.multi_transform(
        {"train": base_tx, "freeze": optax.set_to_zero()}, label_fn
    )


def create_ae_train_state(
    autoencoder,
    key: Array,
    image_size: int,
    base_tx: optax.GradientTransformation,
    num_input_channels: int = 3,
    discriminator=None,
    d_tx: Optional[optax.GradientTransformation] = None,
):
    x = jnp.zeros((1, image_size, image_size, num_input_channels))
    variables = autoencoder.init(
        {"params": key, "noise": key, "dropout": key}, x, train=False
    )
    params = variables["params"]
    tx = masked_encoder_tx(base_tx, params)
    d_params = None
    d_opt = None
    if discriminator is not None:
        d_vars = discriminator.init(key, jnp.zeros((1, image_size, image_size, 3)))
        d_params = d_vars["params"]
        d_opt = (d_tx or base_tx).init(d_params)
    return (
        AETrainState(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            noises=variables.get("noises", {}),
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
            d_params=d_params,
            d_opt=d_opt,
        ),
        tx,
    )


def _apply_ae(autoencoder, params, batch_stats, noises, x, rng, train: bool):
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    if noises:
        variables["noises"] = noises
    kwargs = dict(rngs={"noise": rng, "dropout": rng})
    if train and batch_stats:
        out, new_state = autoencoder.apply(
            variables, x, train=True, mutable=["batch_stats"], **kwargs
        )
        return out, new_state.get("batch_stats", batch_stats)
    out = autoencoder.apply(variables, x, train=train, **kwargs)
    return out, batch_stats


def reconstruction_loss_fn(
    reconstructed: Array, target: Array, lpips: Optional[Callable]
) -> Dict[str, Array]:
    """Per-image-mean MSE summed over the batch (+ LPIPS) (reference
    calculate_loss, autoencoder_updater.py:44-57)."""
    mse = jnp.sum(jnp.mean(jnp.square(reconstructed - target), axis=(1, 2, 3)))
    losses = {"reconstruction_loss": mse}
    total = mse
    if lpips is not None:
        p = jnp.sum(lpips(reconstructed, target))
        losses["perceptual_loss"] = p
        total = total + p
    losses["autoencoder_loss"] = total
    return losses


def make_autoencoder_train_step(
    autoencoder,
    tx: optax.GradientTransformation,
    lpips: Optional[Callable] = None,
    donate: bool = True,
) -> Callable:
    def train_step(state: AETrainState, batch: Dict[str, Array], rng: Array):
        def loss_fn(params):
            recon, new_bs = _apply_ae(
                autoencoder, params, state.batch_stats, state.noises,
                batch["input_image"], rng, train=True,
            )
            losses = reconstruction_loss_fn(recon, batch["output_image"], lpips)
            return losses["autoencoder_loss"], (new_bs, losses)

        (_, (new_bs, losses)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        state = state.replace(
            params=params, batch_stats=new_bs, opt_state=opt_state,
            step=state.step + 1,
        )
        return state, losses

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_autoencoder_gan_steps(
    autoencoder,
    discriminator,
    tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    lpips: Optional[Callable] = None,
    r1_weight: float = 10.0,
    d_interval: int = 16,
    donate: bool = True,
) -> Dict[str, Callable]:
    """GAN-augmented reconstruction (reference
    autoencoder_discriminator_updater.py:12-121)."""

    def d_step(state: AETrainState, batch, rng):
        # autoencoder stays in TRAIN mode during the D update (the reference
        # never flips the module to eval, autoencoder_discriminator_updater.py
        # update_discriminator) — BN running stats advance here too
        recon, new_bs = _apply_ae(
            autoencoder, state.params, state.batch_stats, state.noises,
            batch["input_image"], rng, train=True,
        )
        recon = jax.lax.stop_gradient(recon)

        def loss_fn(d_params):
            fake_pred = discriminator.apply({"params": d_params}, recon)
            real_pred = discriminator.apply(
                {"params": d_params}, batch["output_image"]
            )
            loss = d_logistic_loss(real_pred, fake_pred)
            return loss, (jnp.mean(real_pred), jnp.mean(fake_pred))

        (loss, (real_score, fake_score)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.d_params)
        updates, d_opt = d_tx.update(grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, updates)
        return state.replace(
            d_params=d_params, d_opt=d_opt, batch_stats=new_bs
        ), {
            "loss": loss, "real_score": real_score, "fake_score": fake_score,
        }

    def d_reg_step(state: AETrainState, batch):
        d_params, d_opt, penalty, _ = r1_update(
            lambda p, x: discriminator.apply({"params": p}, x),
            d_tx, r1_weight, d_interval,
            state.d_params, state.d_opt, batch["output_image"],
        )
        return state.replace(d_params=d_params, d_opt=d_opt), {
            "gradient_penalty": penalty,
        }

    def g_step(state: AETrainState, batch, rng):
        def loss_fn(params):
            recon, new_bs = _apply_ae(
                autoencoder, params, state.batch_stats, state.noises,
                batch["input_image"], rng, train=True,
            )
            losses = reconstruction_loss_fn(recon, batch["output_image"], lpips)
            pred = discriminator.apply({"params": state.d_params}, recon)
            adv = g_nonsaturating_loss(pred)
            losses["discriminator_loss"] = adv
            total = losses["autoencoder_loss"] + adv
            losses["loss"] = total
            return total, (new_bs, losses)

        (_, (new_bs, losses)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        state = state.replace(
            params=params, batch_stats=new_bs, opt_state=opt_state,
            step=state.step + 1,
        )
        return state, losses

    kw = dict(donate_argnums=(0,)) if donate else {}
    return {
        "d_step": jax.jit(d_step, **kw),
        "d_reg_step": jax.jit(d_reg_step, **kw),
        "g_step": jax.jit(g_step, **kw),
    }


class AutoencoderUpdater(Updater):
    """(reference AutoencoderUpdater.update_core, autoencoder_updater.py:59-68)."""

    def __init__(self, train_step: Callable, state: AETrainState, iterators,
                 seed: int = 0):
        super().__init__(iterators, seed=seed)
        self.train_step = train_step
        self.state = state

    def update_core(self):
        batch = {k: jnp.asarray(v) for k, v in self.next_batch("images").items()}
        self.state, losses = self.train_step(self.state, batch, self.next_rng())
        self.report(losses, prefix="loss")


class AutoencoderDiscriminatorUpdater(Updater):
    """(reference autoencoder_discriminator_updater.py:29-45)."""

    def __init__(self, steps: Dict[str, Callable], state: AETrainState,
                 iterators, d_interval: int = 16, seed: int = 0):
        super().__init__(iterators, seed=seed)
        self.steps = steps
        self.state = state
        self.d_interval = d_interval

    def update_core(self):
        batch = {k: jnp.asarray(v) for k, v in self.next_batch("images").items()}
        self.state, d_metrics = self.steps["d_step"](
            self.state, batch, self.next_rng()
        )
        if self.iteration % self.d_interval == 0:
            self.state, reg = self.steps["d_reg_step"](self.state, batch)
            d_metrics.update(reg)
        self.report(d_metrics, prefix="discriminator")
        self.state, g_metrics = self.steps["g_step"](
            self.state, batch, self.next_rng()
        )
        self.report(g_metrics, prefix="generator")
