"""Adversarial autoencoder training: binary → styled image translation.

Capability parity with the reference
(/root/reference/stylegan_code_finder/updater/adversarial_updater.py:11-115):
* D step: softplus logistic on generator(binary, style) vs real style image,
  with R1 every d_interval (:28-67).
* G step: masked binary reconstruction (through a frozen reconstructor
  autoencoder) + masked perceptual + style Gram + adversarial (:74-115).
* mask = 1 - (binary+1)/2 of the first channel (:68-73).

Functional re-design: three jitted step functions over one state pytree; the
frozen reconstructor's params never enter any optimizer.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import flax
import jax
import jax.numpy as jnp
import optax

from synthesis_in_style_tpu.core.updater import Updater
from synthesis_in_style_tpu.losses.gan import r1_update

Array = jax.Array

DEFAULT_LOSS_WEIGHTS = {
    # (reference train_adversarial_generator.py:104-109)
    "reconstruction": 2.0,
    "discriminator": 1.0,
    "style": 1e-7,
    "perceptual": 0.1,
}


@flax.struct.dataclass
class AdversarialTrainState:
    g_params: Any  # generation autoencoder (content+style -> image)
    g_batch_stats: Any
    g_noises: Any
    d_params: Any
    reconstructor_variables: Any  # frozen full variables (params+batch_stats)
    g_opt: Any
    d_opt: Any
    step: Array


def create_mask(binary_image: Array) -> Array:
    """(reference create_mask :68-73): 1 - normalized first channel."""
    mask = binary_image[..., 0:1]
    mask = (mask + 1.0) / 2.0
    return jax.lax.stop_gradient(1.0 - mask)


def make_adversarial_steps(
    generator,  # ContentAndStyleStyleganAutoencoder
    discriminator,
    reconstructor,  # StyleganAutoencoder, frozen
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    perceptual_and_style,  # losses.perceptual.PerceptualAndStyleLoss
    loss_weights: Dict[str, float] = None,
    r1_weight: float = 10.0,
    d_interval: int = 16,
    donate: bool = True,
) -> Dict[str, Callable]:
    weights = {**DEFAULT_LOSS_WEIGHTS, **(loss_weights or {})}

    def gen_forward(g_params, g_batch_stats, g_noises, binary, style, rng,
                    train: bool):
        variables = {"params": g_params}
        if g_batch_stats:
            variables["batch_stats"] = g_batch_stats
        if g_noises:
            variables["noises"] = g_noises
        if train and g_batch_stats:
            fake, new_state = generator.apply(
                variables, binary, style, train=True,
                mutable=["batch_stats"],
                rngs={"noise": rng, "dropout": rng},
            )
            return fake, new_state.get("batch_stats", g_batch_stats)
        fake = generator.apply(
            variables, binary, style, train=train,
            rngs={"noise": rng, "dropout": rng},
        )
        return fake, g_batch_stats

    def d_step(state: AdversarialTrainState, binary, style, rng):
        # generator stays in TRAIN mode during the D update (the reference
        # never switches the module to eval, adversarial_updater.py
        # update_discriminator) — its BN running stats advance here too
        fake, new_g_bs = gen_forward(
            state.g_params, state.g_batch_stats, state.g_noises,
            binary, style, rng, True,
        )
        fake = jax.lax.stop_gradient(fake)

        def loss_fn(d_params):
            fake_pred = discriminator.apply({"params": d_params}, fake)
            real_pred = discriminator.apply({"params": d_params}, style)
            fake_loss = jnp.mean(jax.nn.softplus(fake_pred))
            real_loss = jnp.mean(jax.nn.softplus(-real_pred))
            return fake_loss + real_loss, (
                jnp.mean(real_pred), jnp.mean(fake_pred)
            )

        (loss, (real_score, fake_score)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.d_params)
        updates, d_opt = d_tx.update(grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, updates)
        return state.replace(
            d_params=d_params, d_opt=d_opt, g_batch_stats=new_g_bs
        ), {
            "loss": loss, "real_score": real_score, "fake_score": fake_score,
        }

    def d_reg_step(state: AdversarialTrainState, style):
        d_params, d_opt, penalty, _ = r1_update(
            lambda p, x: discriminator.apply({"params": p}, x),
            d_tx, r1_weight, d_interval,
            state.d_params, state.d_opt, style,
        )
        return state.replace(d_params=d_params, d_opt=d_opt), {
            "gradient_penalty": penalty,
        }

    def g_step(state: AdversarialTrainState, binary, style, rng):
        mask = create_mask(binary)

        def loss_fn(g_params):
            fake, new_bs = gen_forward(
                g_params, state.g_batch_stats, state.g_noises,
                binary, style, rng, True,
            )
            reconstructed_binary = reconstructor.apply(
                state.reconstructor_variables, fake,
                rngs={"noise": rng},
            )
            recon = weights["reconstruction"] * jnp.mean(
                jnp.square(mask * (reconstructed_binary - binary))
            )
            style_l, perceptual_l = perceptual_and_style(fake, style, mask)
            style_l = weights["style"] * style_l
            perceptual_l = weights["perceptual"] * perceptual_l
            pred = discriminator.apply({"params": state.d_params}, fake)
            adv = weights["discriminator"] * jnp.mean(jax.nn.softplus(-pred))
            total = recon + adv + perceptual_l + style_l
            return total, (new_bs, {
                "loss": total,
                "discriminator_loss": adv,
                "reconstruction_loss": recon / weights["reconstruction"],
                "perceptual_loss": perceptual_l,
                "style_loss": style_l,
            })

        (_, (new_bs, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.g_params)
        updates, g_opt = g_tx.update(grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)
        return state.replace(
            g_params=g_params, g_batch_stats=new_bs, g_opt=g_opt,
            step=state.step + 1,
        ), metrics

    kw = dict(donate_argnums=(0,)) if donate else {}
    return {
        "d_step": jax.jit(d_step, **kw),
        "d_reg_step": jax.jit(d_reg_step, **kw),
        "g_step": jax.jit(g_step, **kw),
    }


class AdversarialAutoencoderUpdater(Updater):
    """(reference update_core, adversarial_updater.py:19-26)."""

    def __init__(self, steps: Dict[str, Callable],
                 state: AdversarialTrainState, iterators,
                 d_interval: int = 16, seed: int = 0):
        super().__init__(iterators, seed=seed)
        self.steps = steps
        self.state = state
        self.d_interval = d_interval

    def update_core(self):
        binary = jnp.asarray(self.next_batch("binary_images"))
        style = jnp.asarray(self.next_batch("original_images"))
        self.state, d_metrics = self.steps["d_step"](
            self.state, binary, style, self.next_rng()
        )
        if self.iteration % self.d_interval == 0:
            self.state, reg = self.steps["d_reg_step"](self.state, style)
            d_metrics.update(reg)
        self.report(d_metrics, prefix="discriminator")
        self.state, g_metrics = self.steps["g_step"](
            self.state, binary, style, self.next_rng()
        )
        self.report(g_metrics, prefix="generator")
