"""StyleGAN2 training step — TPU-native (reference updater/stylegan_2_updater.py).

Capability parity, re-designed functionally:

* D step / G step / EMA fused into jitted pure functions over one immutable
  `GANTrainState` pytree (reference mutates four torch modules in place).
* Lazy regularization (R1 every `d_reg_every`=16, path-length every
  `g_reg_every`=4, stylegan_2_updater.py:144-200) is dispatched host-side on
  the iteration counter — four separately-jitted step functions, each compiled
  once, instead of the reference's `conv2d_gradfix` machinery; JAX grad-of-grad
  handles the double backward natively.
* Style mixing prob 0.9 (ref :78-82) is traced: `inject_index = n_latent`
  (no mixing) vs uniform(1, n_latent-1), selected by a PRNG draw, so one
  compiled graph covers both branches.
* The path-length mean is all-reduced across data-parallel workers for free:
  under a sharded jit, `jnp.mean` over the global batch IS the collective the
  reference does by hand via `reduce_sum` (distributed/__init__.py:4-14).
* EMA decay 0.5 ** (32 / (10 * 1000)) (ref :33).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from synthesis_in_style_tpu.core.updater import Updater
from synthesis_in_style_tpu.losses.gan import d_logistic_loss, g_nonsaturating_loss, r1_update
from synthesis_in_style_tpu.utils.precision import cast_floating


@flax.struct.dataclass
class StyleGAN2Config:
    r1_weight: float = 10.0
    path_reg_weight: float = 2.0
    d_reg_every: int = 16
    g_reg_every: int = 4
    mixing_prob: float = 0.9
    path_batch_shrink: int = 2
    ema_decay: float = 0.5 ** (32 / (10 * 1000))
    # per-layer frozen stochastic noise (reference
    # stylegan_2_updater.py:35-43, :68-76): layers listed here feed the
    # stored noise buffer every training forward while the rest re-randomize
    # per step. Static tuple — part of the compiled graph structure.
    freeze_noise_layers: Tuple[int, ...] = flax.struct.field(
        pytree_node=False, default=()
    )
    # mixed precision: run D/G forward+backward in this dtype (e.g.
    # "bfloat16") with f32 master params/optimizer state; the lazy R1 and
    # path-length double-grad steps stay f32 for accuracy. bf16 shares f32's
    # exponent range, so no loss scaling is needed.
    compute_dtype: Optional[str] = flax.struct.field(
        pytree_node=False, default=None
    )


@flax.struct.dataclass
class GANTrainState:
    g_params: Any
    d_params: Any
    g_ema: Any
    g_noises: Any
    g_opt: Any
    d_opt: Any
    mean_path_length: jax.Array
    step: jax.Array


def create_gan_train_state(
    gen,
    disc,
    key: jax.Array,
    image_size: int,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
) -> GANTrainState:
    kg, kd, kn = jax.random.split(key, 3)
    z = jnp.zeros((2, gen.style_dim))
    g_vars = gen.init({"params": kg, "noise": kn}, [z])
    d_vars = disc.init(kd, jnp.zeros((2, image_size, image_size, 3)))
    g_params = g_vars["params"]
    return GANTrainState(
        g_params=g_params,
        d_params=d_vars["params"],
        g_ema=jax.tree_util.tree_map(jnp.copy, g_params),  # real copy: donation-safe
        g_noises=g_vars.get("noises", {}),
        g_opt=g_tx.init(g_params),
        d_opt=d_tx.init(d_vars["params"]),
        mean_path_length=jnp.zeros(()),
        step=jnp.zeros((), jnp.int32),
    )


def _mixed_forward(gen, g_vars, z1, z2, inject_index, noise_key, **kwargs):
    return gen.apply(
        g_vars,
        [z1, z2],
        inject_index=inject_index,
        rngs={"noise": noise_key},
        **kwargs,
    )


def _sample_inject_index(rng, mixing_prob: float, n_latent: int):
    """inject_index == n_latent means "no mixing" (all layers take style 0)."""
    k_flip, k_idx = jax.random.split(rng)
    mixed = jax.random.uniform(k_flip) < mixing_prob
    idx = jax.random.randint(k_idx, (), 1, n_latent)
    return jnp.where(mixed, idx, n_latent)


def restore_gan_snapshot(state: GANTrainState, tree) -> GANTrainState:
    """Restore a Snapshotter tree (keys generator/discriminator/g_ema[/
    g_noises/generator_optimizer/discriminator_optimizer]) into a fresh
    train state (reference resume, train_stylegan_2.py:75-77 — the torch
    state dicts carried noise buffers and optimizer moments too)."""
    asarray = lambda t: jax.tree_util.tree_map(jnp.asarray, t)  # noqa: E731
    # partial checkpoints (e.g. converted reference .pt with only g_ema)
    # restore what they carry, like the reference's key-selecting
    # load_weights (networks/__init__.py:22-29)
    if "generator" in tree:
        state = state.replace(g_params=asarray(tree["generator"]))
    if "discriminator" in tree:
        state = state.replace(d_params=asarray(tree["discriminator"]))
    if "g_ema" in tree:
        state = state.replace(g_ema=asarray(tree["g_ema"]))
    if "g_noises" in tree:
        state = state.replace(g_noises=asarray(tree["g_noises"]))
    # orbax restores plain nested containers; rebuild the optax state
    # structure matching namedtuple fields by NAME (not leaf order).
    # Each optimizer restores independently — a partial checkpoint carrying
    # only one of them must neither KeyError nor silently skip the other.
    if "generator_optimizer" in tree or "discriminator_optimizer" in tree:
        from synthesis_in_style_tpu.utils.checkpoint import restore_structured

        if "generator_optimizer" in tree:
            state = state.replace(
                g_opt=restore_structured(state.g_opt, tree["generator_optimizer"])
            )
        if "discriminator_optimizer" in tree:
            state = state.replace(
                d_opt=restore_structured(state.d_opt, tree["discriminator_optimizer"])
            )
    if "training_state" in tree and "mean_path_length" in tree["training_state"]:
        # the path-length running mean is training state too: without it a
        # resume restarts the 0.01-decay mean at 0 and the first reg steps
        # see a large spurious path penalty (the torch reference shares
        # this gap; we close it — the key is additive, old snapshots and
        # converted reference .pt files simply lack it)
        state = state.replace(
            mean_path_length=jnp.asarray(
                tree["training_state"]["mean_path_length"], jnp.float32
            )
        )
    return state


def make_train_steps(
    gen,
    disc,
    g_tx: optax.GradientTransformation,
    d_tx: optax.GradientTransformation,
    cfg: StyleGAN2Config,
    batch_size: int,
    donate: bool = True,
    mesh=None,
) -> Dict[str, Callable]:
    """Build the four jitted step functions. All take (state, [real,] rng) and
    return (state, metrics).

    `mesh`: with a ("data",) mesh, the in-jit latent draws are
    sharding-constrained over the batch axis — without the hint, GSPMD can
    leave the whole generator-side compute replicated (the G step has no
    sharded *input* to propagate from)."""

    n_latent = gen.n_latent
    style_dim = gen.style_dim
    compute_dtype = (
        jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype is not None else None
    )

    def _shard_hint(x):
        if mesh is None or x.shape[0] % mesh.devices.size != 0:
            return x
        from jax.sharding import NamedSharding, PartitionSpec

        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, PartitionSpec("data"))
        )

    def _cast(tree):
        """floating leaves -> compute dtype (grad flows back to f32 masters);
        shared predicate with the segmentation steps (utils/precision.py)."""
        if compute_dtype is None:
            return tree
        return cast_floating(tree, compute_dtype)

    def _stochastic_noise(g_noises):
        """Per-layer noise feed (reference make_stochastic_noise,
        stylegan_2_updater.py:68-76): frozen layers reuse the stored buffer,
        the rest get None = re-randomized from the "noise" PRNG stream."""
        if not cfg.freeze_noise_layers:
            return None
        frozen = set(cfg.freeze_noise_layers)
        return [
            g_noises[f"noise_{i}"] if i in frozen else None
            for i in range(gen.num_layers)
        ]

    def _fake_images(g_params, g_noises, rng, batch):
        kz1, kz2, kmix, knoise = jax.random.split(rng, 4)
        dtype = compute_dtype or jnp.float32
        z1 = _shard_hint(jax.random.normal(kz1, (batch, style_dim), dtype))
        z2 = _shard_hint(jax.random.normal(kz2, (batch, style_dim), dtype))
        inject = _sample_inject_index(kmix, cfg.mixing_prob, n_latent)
        cast_noises = _cast(g_noises)
        img, _ = _mixed_forward(
            gen,
            {"params": _cast(g_params), "noises": cast_noises},
            z1, z2, inject, knoise,
            noise=_stochastic_noise(cast_noises),
        )
        return img

    # ---------------- D step (ref :123-142) ----------------
    def d_step(state: GANTrainState, real: jax.Array, rng: jax.Array):
        fake = _fake_images(state.g_params, state.g_noises, rng, real.shape[0])
        if compute_dtype is not None:
            real = real.astype(compute_dtype)

        def loss_fn(d_params):
            d_cast = _cast(d_params)
            fake_pred = disc.apply({"params": d_cast}, fake).astype(jnp.float32)
            real_pred = disc.apply({"params": d_cast}, real).astype(jnp.float32)
            loss = d_logistic_loss(real_pred, fake_pred)
            return loss, (jnp.mean(real_pred), jnp.mean(fake_pred))

        (loss, (real_score, fake_score)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.d_params)
        updates, d_opt = d_tx.update(grads, state.d_opt, state.d_params)
        d_params = optax.apply_updates(state.d_params, updates)
        state = state.replace(d_params=d_params, d_opt=d_opt)
        return state, {
            "discriminator_loss": loss,
            "real_score": real_score,
            "fake_score": fake_score,
        }

    # ---------------- R1 regularization (ref :144-156) ----------------
    def d_reg_step(state: GANTrainState, real: jax.Array):
        d_params, d_opt, _, r1 = r1_update(
            lambda p, x: disc.apply({"params": p}, x),
            d_tx, cfg.r1_weight, cfg.d_reg_every,
            state.d_params, state.d_opt, real,
        )
        state = state.replace(d_params=d_params, d_opt=d_opt)
        return state, {"r1_penalty": r1}

    # ---------------- G step (ref :158-173) ----------------
    def g_step(state: GANTrainState, rng: jax.Array):
        def loss_fn(g_params):
            fake = _fake_images(g_params, state.g_noises, rng, batch_size)
            fake_pred = disc.apply(
                {"params": _cast(state.d_params)}, fake
            ).astype(jnp.float32)
            return g_nonsaturating_loss(fake_pred)

        loss, grads = jax.value_and_grad(loss_fn)(state.g_params)
        updates, g_opt = g_tx.update(grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)
        state = state.replace(
            g_params=g_params, g_opt=g_opt, step=state.step + 1
        )
        return state, {"generator_loss": loss}

    # ---------------- EMA accumulate (ref :53-60) -------------------------
    # Runs LAST in update_core — after the path-length regularization has
    # touched g_params — matching the reference's accumulate-at-end order
    # (stylegan_2_updater.py:223).
    def ema_step(state: GANTrainState):
        g_ema = jax.tree_util.tree_map(
            lambda e, p: e * cfg.ema_decay + (1 - cfg.ema_decay) * p,
            state.g_ema,
            state.g_params,
        )
        return state.replace(g_ema=g_ema), {}

    # ---------------- path-length regularization (ref :175-200) ----------
    def g_reg_step(state: GANTrainState, rng: jax.Array):
        path_batch = max(1, batch_size // cfg.path_batch_shrink)
        kz1, kz2, kmix, knoise, kpl = jax.random.split(rng, 5)
        z1 = _shard_hint(jax.random.normal(kz1, (path_batch, style_dim)))
        z2 = _shard_hint(jax.random.normal(kz2, (path_batch, style_dim)))
        inject = _sample_inject_index(kmix, cfg.mixing_prob, n_latent)

        def loss_fn(g_params):
            g_vars = {"params": g_params, "noises": state.g_noises}
            # build the (B, n_latent, D) latent explicitly so we can vjp wrt it
            w1 = gen.apply(g_vars, z1, method=type(gen).style)
            w2 = gen.apply(g_vars, z2, method=type(gen).style)
            layer_pos = jnp.arange(n_latent)[None, :, None]
            latent = jnp.where(
                layer_pos < inject, w1[:, None, :], w2[:, None, :]
            )

            def synth(lat):
                img, _ = gen.apply(
                    g_vars,
                    [lat],
                    input_is_latent=True,
                    rngs={"noise": knoise},
                    noise=_stochastic_noise(state.g_noises),
                )
                return img

            img, vjp_fn = jax.vjp(synth, latent)
            h, w = img.shape[1], img.shape[2]
            noise_img = jax.random.normal(kpl, img.shape) / math.sqrt(h * w)
            (grad_lat,) = vjp_fn(noise_img)
            path_lengths = jnp.sqrt(
                jnp.mean(jnp.sum(jnp.square(grad_lat), axis=2), axis=1)
            )
            # decay-0.01 running mean; under sharded jit this mean is global
            path_mean = state.mean_path_length + 0.01 * (
                jnp.mean(path_lengths) - state.mean_path_length
            )
            path_loss = jnp.mean(jnp.square(path_lengths - path_mean))
            weighted = (
                cfg.path_reg_weight * cfg.g_reg_every * path_loss
                + 0.0 * img[0, 0, 0, 0]  # keep all params in the graph (ref :188)
            )
            return weighted, (path_loss, path_mean, jnp.mean(path_lengths))

        (loss, (path_loss, path_mean, path_len)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.g_params)
        updates, g_opt = g_tx.update(grads, state.g_opt, state.g_params)
        g_params = optax.apply_updates(state.g_params, updates)
        state = state.replace(
            g_params=g_params, g_opt=g_opt, mean_path_length=path_mean
        )
        return state, {
            "path_loss": path_loss,
            "path_length": path_len,
            "mean_path_length": path_mean,
        }

    donate_kw = dict(donate_argnums=(0,)) if donate else {}
    return {
        "d_step": jax.jit(d_step, **donate_kw),
        "d_reg_step": jax.jit(d_reg_step, **donate_kw),
        "g_step": jax.jit(g_step, **donate_kw),
        "g_reg_step": jax.jit(g_reg_step, **donate_kw),
        "ema_step": jax.jit(ema_step, **donate_kw),
    }


class StyleGAN2Updater(Updater):
    """Host-side loop body: D → (R1 every 16) → G (+EMA) → (PL every 4)
    (reference update_core order, stylegan_2_updater.py:202-223)."""

    def __init__(
        self,
        gen,
        disc,
        g_tx,
        d_tx,
        state: GANTrainState,
        iterators,
        batch_size: int,
        cfg: Optional[StyleGAN2Config] = None,
        seed: int = 0,
        mesh=None,
    ):
        """`mesh`: a ("data",) jax.sharding.Mesh for multi-chip data
        parallelism — params are replicated, batches sharded on axis 0, and
        XLA inserts the gradient/path-length collectives (parallel/mesh.py).
        None = single-device."""
        super().__init__(iterators, seed=seed)
        self.cfg = cfg or StyleGAN2Config()
        self.gen = gen
        self.disc = disc
        self.mesh = mesh
        if mesh is not None:
            from synthesis_in_style_tpu.parallel import replicate

            state = replicate(mesh, state)
        self.state = state
        self.steps = make_train_steps(
            gen, disc, g_tx, d_tx, self.cfg, batch_size, mesh=mesh
        )

    def update_core(self):
        real = jnp.asarray(self.next_batch("images"))
        if self.mesh is not None:
            from synthesis_in_style_tpu.parallel import shard_batch

            real = shard_batch(self.mesh, real)
        metrics = {}

        self.state, m = self.steps["d_step"](self.state, real, self.next_rng())
        metrics.update(m)

        if self.cfg.d_reg_every > 0 and self.iteration % self.cfg.d_reg_every == 0:
            self.state, m = self.steps["d_reg_step"](self.state, real)
            metrics.update(m)

        self.state, m = self.steps["g_step"](self.state, self.next_rng())
        metrics.update(m)

        if self.cfg.g_reg_every > 0 and self.iteration % self.cfg.g_reg_every == 0:
            self.state, m = self.steps["g_reg_step"](self.state, self.next_rng())
            metrics.update(m)

        # EMA last, after all generator updates this iteration (ref :223)
        self.state, _ = self.steps["ema_step"](self.state)

        self.report(metrics, prefix="train")
