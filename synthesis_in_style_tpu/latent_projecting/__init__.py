"""Latent projection — GAN inversion by direct optimization of (w+, noise).

Capability parity with the reference
(/root/reference/stylegan_code_finder/latent_projecting/__init__.py:16-193
and latent_projecting/losses.py:11-79), TPU-first:

* `Latents` is a pytree (models.encoder.Latents), so the WHOLE optimization
  step — synthesis forward, loss, grads w.r.t. latents/noise, optax Adam
  update — is ONE jitted function; the reference ran a Python loop of torch
  ops per step (`Projector.project`).
* The ramped LR schedule matches the reference `LambdaLRWithRamp`
  (cosine rampdown + linear rampup — the standard StyleGAN2 projector
  schedule).
* Loss factories: `w_plus_loss` (LPIPS + per-image-summed MSE, losses.py
  :11-27), `naive_noise_loss` (:30-37), `w_plus_style_loss` (:40-60),
  `noise_loss` (:63-79).
* `run_image_reconstruction` optimizes w+ first, then noise (reference
  :123-151); `run_local_style_transfer` (:154-193).
"""

from __future__ import annotations

import math
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from synthesis_in_style_tpu.models.encoder import CodeLatents, Latents

Array = jax.Array

__all__ = [
    "Latents",
    "CodeLatents",
    "LatentPaths",
    "Projector",
    "lr_with_ramp",
    "w_plus_loss",
    "naive_noise_loss",
    "w_plus_style_loss",
    "noise_loss",
    "run_image_reconstruction",
    "run_local_style_transfer",
]


class LatentPaths:
    """Snapshots of the optimization trajectory (reference LatentPaths,
    latent_projecting/__init__.py:59-102) — host-side list of Latents."""

    def __init__(self, items: Optional[List[Latents]] = None):
        self.items = items or []

    def append(self, latents: Latents):
        self.items.append(jax.tree_util.tree_map(np.asarray, latents))

    def __len__(self):
        return len(self.items)

    def __iter__(self):
        return iter(self.items)

    def __add__(self, other: "LatentPaths") -> "LatentPaths":
        return LatentPaths(self.items + other.items)


def lr_with_ramp(base_lr: float, total_steps: int, rampdown: float = 0.25,
                 rampup: float = 0.05):
    """StyleGAN2-projector LR schedule (reference LambdaLRWithRamp)."""

    def schedule(step):
        t = jnp.asarray(step, jnp.float32) / max(1, total_steps)
        ramp = jnp.minimum(1.0, (1.0 - t) / max(rampdown, 1e-8))
        ramp = 0.5 - 0.5 * jnp.cos(ramp * math.pi)
        ramp = ramp * jnp.minimum(1.0, t / max(rampup, 1e-8))
        return base_lr * ramp

    return schedule


# ---------------------------------------------------------------------------
# loss factories (reference latent_projecting/losses.py)
# ---------------------------------------------------------------------------

def w_plus_loss(lambdas: Dict[str, float], lpips: Callable) -> Callable:
    """LPIPS + per-image-summed MSE (reference w_plus_loss :11-27)."""

    def loss_impl(generated: Array, original: Array):
        perceptual = lambdas["l_percept"] * jnp.sum(lpips(generated, original))
        mse = lambdas["l_mse"] * jnp.sum(
            jnp.mean(jnp.square(generated - original), axis=(1, 2, 3))
        )
        loss = perceptual + mse
        return loss, {"perceptual_loss": perceptual, "mse_loss": mse}

    return loss_impl


def naive_noise_loss(lambdas: Dict[str, float]) -> Callable:
    """(reference :30-37)."""

    def loss_impl(generated: Array, original: Array):
        mse = lambdas["l_mse"] * jnp.sum(
            jnp.mean(jnp.square(generated - original), axis=(1, 2, 3))
        )
        return mse, {"mse_loss": mse}

    return loss_impl


def w_plus_style_loss(
    lambdas: Dict[str, float],
    content_image: Array,
    style_image: Array,
    mask_image: Array,
    perceptual_and_style,
) -> Callable:
    """Masked perceptual (vs content) + masked style Gram (vs style) + masked
    MSE (reference :40-60). `perceptual_and_style` is a
    losses.perceptual.PerceptualAndStyleLoss."""

    def loss_impl(generated: Array, original: Array):
        _, perceptual = perceptual_and_style(
            generated, content_image, mask=mask_image
        )
        style, _ = perceptual_and_style(
            generated, style_image, mask=1.0 - mask_image
        )
        style = lambdas["l_style"] * style
        perceptual = lambdas["l_percept"] * perceptual
        mse = lambdas["l_mse"] * jnp.mean(
            jnp.square(mask_image * (generated - content_image))
        )
        loss = mse + style + perceptual
        return loss, {
            "mse_loss": mse, "style_loss": style, "perceptual_loss": perceptual,
        }

    return loss_impl


def noise_loss(
    lambdas: Dict[str, float],
    content_image: Array,
    style_image: Array,
    mask_image: Array,
) -> Callable:
    """(reference :63-79)."""

    def loss_impl(generated: Array, original: Array):
        mse_1 = lambdas["l_mse_1"] * jnp.mean(
            jnp.square(mask_image * (generated - content_image))
        )
        mse_2 = lambdas["l_mse_2"] * jnp.mean(
            jnp.square((1.0 - mask_image) * (generated - style_image))
        )
        return mse_1 + mse_2, {"mse_1": mse_1, "mse_2": mse_2}

    return loss_impl


# ---------------------------------------------------------------------------
# projector
# ---------------------------------------------------------------------------

class Projector:
    """Optimize Latents against target images through a frozen generator
    (reference Projector from pytorch_training, used at
    latent_projecting/__init__.py:105-151)."""

    def __init__(self, gen, variables):
        self.gen = gen
        self.variables = variables
        self._generate = jax.jit(self._generate_impl)

    def _generate_impl(self, latents: Latents) -> Array:
        image, _ = self.gen.apply(
            self.variables,
            [latents.latent],
            input_is_latent=latents.latent.ndim == 3,
            noise=list(latents.noise) if latents.noise is not None else None,
            randomize_noise=False,
        )
        return image

    def generate(self, latents: Latents) -> Array:
        return self._generate(latents)

    def project(
        self,
        latents: Latents,
        images: Array,
        loss_fn: Callable,
        num_steps: int,
        lr: float,
        optimize: str = "latent",  # "latent" | "noise"
        rampdown: float = 0.25,
        rampup: float = 0.05,
        snapshot_every: int = 50,
        abort_condition: Optional[Callable] = None,
    ) -> Tuple[LatentPaths, Latents]:
        """Adam on the selected leaves of the Latents pytree; everything else
        is stop-gradiented. Returns (trajectory snapshots, final latents)."""
        schedule = lr_with_ramp(lr, num_steps, rampdown, rampup)
        tx = optax.adam(schedule)

        def select(lat: Latents):
            return lat.latent if optimize == "latent" else lat.noise

        def rebuild(lat: Latents, value):
            if optimize == "latent":
                return lat.replace(latent=value)
            return lat.replace(noise=value)

        opt_state = tx.init(select(latents))

        @jax.jit
        def step(latents, opt_state):
            def loss_of(opt_leaves):
                full = rebuild(
                    jax.tree_util.tree_map(jax.lax.stop_gradient, latents),
                    opt_leaves,
                )
                generated = self._generate_impl(full)
                loss, parts = loss_fn(generated, images)
                return loss, parts

            (loss, parts), grads = jax.value_and_grad(loss_of, has_aux=True)(
                select(latents)
            )
            updates, new_opt = tx.update(grads, opt_state, select(latents))
            new_leaves = optax.apply_updates(select(latents), updates)
            return rebuild(latents, new_leaves), new_opt, loss, parts

        paths = LatentPaths()
        loss_value = None
        for i in range(num_steps):
            latents, opt_state, loss, parts = step(latents, opt_state)
            if (i + 1) % snapshot_every == 0 or i == num_steps - 1:
                paths.append(latents)
            if abort_condition is not None:
                loss_value = float(loss)
                if abort_condition(loss_value, i):
                    break
        return paths, latents


def run_image_reconstruction(
    projector: Projector,
    latents: Latents,
    images: Array,
    lpips: Callable,
    latent_step: int = 1000,
    noise_step: int = 1000,
    lr: float = 0.1,
    noise_lr: float = 5.0,
    mse: float = 0.0,
    do_optimize_noise: bool = True,
    latent_abort_condition=None,
    noise_abort_condition=None,
    **ramp_kwargs,
) -> Tuple[LatentPaths, Latents]:
    """w+ optimization then noise optimization (reference
    run_image_reconstruction, latent_projecting/__init__.py:123-151)."""
    paths, best = projector.project(
        latents, images,
        w_plus_loss({"l_percept": 1.0, "l_mse": mse}, lpips),
        latent_step, lr, optimize="latent",
        abort_condition=latent_abort_condition, **ramp_kwargs,
    )
    if do_optimize_noise:
        more_paths, best = projector.project(
            best, images,
            naive_noise_loss({"l_mse": 1.0}),
            noise_step, noise_lr, optimize="noise",
            abort_condition=noise_abort_condition, **ramp_kwargs,
        )
        paths = paths + more_paths
    return paths, best


def run_local_style_transfer(
    projector: Projector,
    latents: Latents,
    content_image: Array,
    style_image: Array,
    mask_image: Array,
    perceptual_and_style,
    style_latent_step: int = 1000,
    style_noise_step: int = 1000,
    lr: float = 0.1,
    noise_lr: float = 5.0,
    **ramp_kwargs,
) -> Tuple[LatentPaths, Latents]:
    """(reference run_local_style_transfer, :154-193)."""
    paths, best = projector.project(
        latents, content_image,
        w_plus_style_loss(
            {"l_percept": 1.0, "l_mse": 1.0, "l_style": 1.0},
            content_image, style_image, mask_image, perceptual_and_style,
        ),
        style_latent_step, lr, optimize="latent", **ramp_kwargs,
    )
    reference_image = projector.generate(best)
    more_paths, best = projector.project(
        best, content_image,
        noise_loss({"l_mse_1": 1.0, "l_mse_2": 1.0},
                   content_image, reference_image, mask_image),
        style_noise_step, noise_lr, optimize="noise", **ramp_kwargs,
    )
    return paths + more_paths, best
