"""Segmentation training steps — TPU-native
(reference updater/segmentation_updater.py).

Capability parity, re-designed functionally:

* One immutable `SegTrainState` pytree (params, batch_stats, opt state) and a
  single jitted train step per architecture, instead of in-place module
  mutation + `GradientApplier` (reference :26-38).
* `StandardUpdater` — weighted pixel CE for DocUFCN (reference :11-39).
* `TransUNetUpdater` — 0.5*CE + 0.5*Dice (reference :76-106).
* `EMANetUpdater` — CE + the EMAU µ-bases moving average; the µ update is
  part of the jitted step's state transition (the reference mutates
  `network.emau.mu` under no_grad host-side, :56-66 — here µ is just another
  leaf of the train state, and under a batch-sharded jit the batch-mean of µ
  is automatically the global mean, replacing SyncBN/DDP concerns).
* BatchNorm batch statistics update through the flax `batch_stats` mutable
  collection; under a data-sharded jit the statistics are global-batch
  statistics (subsumes the reference's vendored SyncBN, SURVEY.md §2.6).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from synthesis_in_style_tpu.core.updater import Updater
from synthesis_in_style_tpu.losses.segmentation import cross_entropy_loss, dice_loss
from synthesis_in_style_tpu.utils.precision import cast_floating

Array = jax.Array


@flax.struct.dataclass
class SegTrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: Array
    extra: Any = None  # architecture-specific state (e.g. EMANet µ)


def create_seg_train_state(
    model,
    key: Array,
    image_size: int,
    tx: optax.GradientTransformation,
    num_input_channels: int = 3,
    extra: Any = None,
) -> SegTrainState:
    x = jnp.zeros((1, image_size, image_size, num_input_channels))
    variables = model.init({"params": key, "dropout": key}, x, train=False)
    params = variables["params"]
    return SegTrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        extra=extra,
    )


def _dropout_key(rng: Array, impl: Optional[str]) -> Array:
    """Re-house the per-step key in another PRNG implementation for the
    dropout stream. `impl="rbg"` uses the TPU's hardware RNG instruction —
    dramatically cheaper on the VPU than threefry for the ~0.5G dropout
    samples a DocUFCN 256px/b8 step draws (scripts/docufcn_roofline.py
    measures the difference). Mask streams change (dropout needs no
    cross-run bit-stability), param/init streams are untouched."""
    if impl is None:
        return rng
    data = (
        jax.random.key_data(rng)
        if jnp.issubdtype(rng.dtype, jax.dtypes.prng_key)
        else rng
    )
    # threefry key data is 2x uint32, rbg wants 4x — tile it
    return jax.random.wrap_key_data(
        jnp.concatenate([data, data])[:4], impl=impl
    )


def _apply_train(
    model, params, batch_stats, images, rng, compute_dtype=None,
    extra_inputs=(),
):
    """Forward in train mode. With `compute_dtype` (e.g. bfloat16) the params
    and input are cast for the fwd/bwd MXU work while the caller's master
    params stay float32; the output pytree and updated batch statistics are
    cast back to float32 so losses and running state never degrade (mirrors
    the GAN updater's mixed precision, stylegan2_updater.py `compute_dtype`).
    `extra_inputs` are positional model inputs after the image batch (e.g.
    EMANet's µ bases) and are passed through uncast."""
    if compute_dtype is not None:
        params = cast_floating(params, compute_dtype)
        images = images.astype(compute_dtype)
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    out, new_state = model.apply(
        variables,
        images,
        *extra_inputs,
        train=True,
        mutable=["batch_stats"] if batch_stats else [],
        rngs={"dropout": rng},
    )
    new_batch_stats = new_state.get("batch_stats", batch_stats) if batch_stats else batch_stats
    if compute_dtype is not None:
        out = cast_floating(out, jnp.float32)
        new_batch_stats = cast_floating(new_batch_stats, jnp.float32)
    return out, new_batch_stats


def make_standard_train_step(
    model,
    tx: optax.GradientTransformation,
    class_weights: Optional[Array] = None,
    donate: bool = True,
    compute_dtype: Optional[str] = None,
    dropout_rng_impl: Optional[str] = None,
) -> Callable:
    """Weighted-CE step (reference StandardUpdater.update_core :19-39)."""

    weights = None if class_weights is None else jnp.asarray(class_weights)
    cdt = jnp.dtype(compute_dtype) if compute_dtype is not None else None

    def train_step(state: SegTrainState, batch: Dict[str, Array], rng: Array):
        rng = _dropout_key(rng, dropout_rng_impl)

        def loss_fn(params):
            logits, new_bs = _apply_train(
                model, params, state.batch_stats, batch["images"], rng,
                compute_dtype=cdt,
            )
            loss = cross_entropy_loss(logits, batch["segmented"], weights)
            return loss, new_bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        state = state.replace(
            params=params,
            batch_stats=new_bs,
            opt_state=opt_state,
            step=state.step + 1,
        )
        return state, {"softmax": loss}

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_transunet_train_step(
    model,
    tx: optax.GradientTransformation,
    num_classes: int,
    donate: bool = True,
    compute_dtype: Optional[str] = None,
    dropout_rng_impl: Optional[str] = None,
) -> Callable:
    """0.5*CE + 0.5*Dice step (reference TransUNetUpdater :76-106)."""

    cdt = jnp.dtype(compute_dtype) if compute_dtype is not None else None

    def train_step(state: SegTrainState, batch: Dict[str, Array], rng: Array):
        rng = _dropout_key(rng, dropout_rng_impl)

        def loss_fn(params):
            logits, new_bs = _apply_train(
                model, params, state.batch_stats, batch["images"], rng,
                compute_dtype=cdt,
            )
            labels = batch["segmented"]
            loss_ce = cross_entropy_loss(logits, labels)
            loss_dice = dice_loss(logits, labels, num_classes)
            loss = 0.5 * loss_ce + 0.5 * loss_dice
            return loss, (new_bs, loss_ce, loss_dice)

        (loss, (new_bs, loss_ce, loss_dice)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        state = state.replace(
            params=params,
            batch_stats=new_bs,
            opt_state=opt_state,
            step=state.step + 1,
        )
        return state, {"combined": loss, "CE": loss_ce, "Dice": loss_dice}

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_emanet_train_step(
    model,
    tx: optax.GradientTransformation,
    em_mom: float = 0.9,
    donate: bool = True,
    compute_dtype: Optional[str] = None,
    dropout_rng_impl: Optional[str] = None,
) -> Callable:
    """CE + EMAU µ moving-average step (reference EMANetUpdater :42-73).
    `state.extra` holds µ of shape (1, C, K); the model returns
    (logits, mu_batch) when given mu and train=True."""

    cdt = jnp.dtype(compute_dtype) if compute_dtype is not None else None

    def train_step(state: SegTrainState, batch: Dict[str, Array], rng: Array):
        rng = _dropout_key(rng, dropout_rng_impl)

        def loss_fn(params):
            (logits, mu_batch), new_bs = _apply_train(
                model, params, state.batch_stats, batch["images"], rng,
                compute_dtype=cdt, extra_inputs=(state.extra,),
            )
            loss = cross_entropy_loss(logits, batch["segmented"])
            return loss, (new_bs, mu_batch)

        (loss, (new_bs, mu_batch)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        # µ moving average (reference :56-66); batch-mean is global under a
        # sharded jit
        mu = jax.lax.stop_gradient(jnp.mean(mu_batch, axis=0, keepdims=True))
        new_mu = state.extra * em_mom + mu * (1 - em_mom)
        state = state.replace(
            params=params,
            batch_stats=new_bs,
            opt_state=opt_state,
            step=state.step + 1,
            extra=new_mu,
        )
        return state, {"softmax": loss}

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


class SegmentationUpdater(Updater):
    """Host loop body shared by all segmentation architectures: fetch batch,
    advance the jitted step, report metrics under the 'loss' prefix
    (reference updaters report the same keys, segmentation_updater.py:39,
    :72, :100-106)."""

    def __init__(
        self,
        train_step: Callable,
        state: SegTrainState,
        iterators,
        seed: int = 0,
        mesh=None,
    ):
        """`mesh`: a ("data",) jax.sharding.Mesh for multi-chip data
        parallelism — params replicated, batches sharded on axis 0; BN
        statistics and gradients become global collectives automatically
        (parallel/mesh.py). None = single-device."""
        super().__init__(iterators, seed=seed)
        self.train_step = train_step
        self.mesh = mesh
        if mesh is not None:
            from synthesis_in_style_tpu.parallel import replicate

            state = replicate(mesh, state)
        self.state = state

    def update_core(self):
        batch = self.next_batch("images")
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        if self.mesh is not None:
            from synthesis_in_style_tpu.parallel import shard_batch

            batch = shard_batch(self.mesh, batch)
        self.state, metrics = self.train_step(self.state, batch, self.next_rng())
        self.report(metrics, prefix="loss")
