"""Train the adversarial binary→styled-image generator.

Capability parity with the reference CLI
(/root/reference/stylegan_code_finder/train_adversarial_generator.py):
generation autoencoder = ContentAndStyle (6-channel input) w+ autoencoder,
frozen reconstruction autoencoder, StyleGAN2 discriminator; Adam with
gradient clipping; loss weights reconstruction=2 / discriminator=1 /
style=1e-7 / perceptual=0.1 (reference :104-109); R1 every 16.

Usage:
  python -m synthesis_in_style_tpu.cli.train_adversarial_generator \
      <autoencoder_checkpoint> --original-images real.json \
      --fake-images binary.json -l out
"""

from __future__ import annotations

import argparse
import datetime
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import optax

from synthesis_in_style_tpu.core.config import (
    load_config_from_checkpoint,
    load_yaml_config,
    save_run_config,
)
from synthesis_in_style_tpu.core.extensions import LogWriter, Snapshotter
from synthesis_in_style_tpu.core.trainer import Trainer
from synthesis_in_style_tpu.data import DataLoader
from synthesis_in_style_tpu.data.loader import EpochStream
from synthesis_in_style_tpu.losses.perceptual import PerceptualAndStyleLoss
from synthesis_in_style_tpu.models.autoencoder import (
    ContentAndStyleStyleganAutoencoder,
    StyleganAutoencoder,
)
from synthesis_in_style_tpu.models.encoder import WPlusEncoder
from synthesis_in_style_tpu.models.factory import get_discriminator, get_generator
from synthesis_in_style_tpu.models.stylegan2 import generator_channels
from synthesis_in_style_tpu.updaters.adversarial_updater import (
    AdversarialAutoencoderUpdater,
    AdversarialTrainState,
    make_adversarial_steps,
)


def build_networks(config: dict):
    # encoder channel map + noise-head layout must match the decoder
    # variant (reference wires encoders through the variant-dispatching
    # get_autoencoder, networks/__init__.py:396-412)
    variant = 1 if str(config.get("stylegan_variant", 2)) == "1" else 2
    if variant == 1:
        from synthesis_in_style_tpu.models.stylegan1 import (
            ProgressiveGenerator,
        )

        gen_channels = ProgressiveGenerator.get_channels()
    else:
        gen_channels = generator_channels(config.get("channel_multiplier", 2))
    decoder = get_generator(config)
    generation_ae = ContentAndStyleStyleganAutoencoder(
        encoder=WPlusEncoder(
            config["image_size"], config["latent_size"],
            2 * config.get("input_dim", 3), gen_channels,
            stylegan_variant=variant,
        ),
        decoder=decoder,
    )
    reconstruction_ae = StyleganAutoencoder(
        encoder=WPlusEncoder(
            config["image_size"], config["latent_size"],
            config.get("input_dim", 3), gen_channels,
            stylegan_variant=variant,
        ),
        decoder=get_generator(config),
    )
    discriminator = get_discriminator(config)
    return generation_ae, reconstruction_ae, discriminator


def main(args: argparse.Namespace) -> None:
    from synthesis_in_style_tpu.parallel import maybe_initialize_distributed

    maybe_initialize_distributed()
    config = load_config_from_checkpoint(args.autoencoder_checkpoint, args.config)
    if args.overwrite_config and args.config:
        config.update(load_yaml_config(args.config))
    log_dir = Path(args.log_dir)

    from synthesis_in_style_tpu.cli.train_stylegan_2 import GANImageDataset

    def make_loader(json_path):
        json_path = Path(json_path)
        dataset = GANImageDataset(
            json_path, root=json_path.parent,
            image_size=config["image_size"],
            num_channels=config.get("input_dim", 3),
        )
        return DataLoader(
            dataset, config["batch_size"],
            num_workers=1 if args.debug else config.get("num_workers", 8),
        )

    real_loader = make_loader(args.original_images)
    fake_loader = make_loader(args.fake_images)

    generation_ae, reconstruction_ae, discriminator = build_networks(config)

    key = jax.random.PRNGKey(config.get("seed", 0))
    size = config["image_size"]
    channels = config.get("input_dim", 3)
    g_vars = generation_ae.init(
        {"params": key, "noise": key},
        jnp.zeros((1, size, size, channels)),
        jnp.zeros((1, size, size, channels)),
        train=False,
    )
    r_vars = reconstruction_ae.init(
        {"params": key, "noise": key},
        jnp.zeros((1, size, size, channels)), train=False,
    )
    d_vars = discriminator.init(key, jnp.zeros((1, size, size, channels)))

    if args.autoencoder_checkpoint and Path(args.autoencoder_checkpoint).is_dir():
        from synthesis_in_style_tpu.utils.checkpoint import load_pytree

        tree = load_pytree(Path(args.autoencoder_checkpoint))
        if "autoencoder" in tree:
            r_vars = jax.tree_util.tree_map(jnp.asarray, tree["autoencoder"])
        if "g_ema" in tree:  # decoder init from a generator snapshot
            g_params = dict(g_vars["params"])
            g_params["decoder"] = jax.tree_util.tree_map(
                jnp.asarray, tree["g_ema"]
            )
            g_vars = {**g_vars, "params": g_params}

    # torch-style coupled L2 (reference GradientClipAdam), not adamw's
    # decoupled decay
    optimizer_opts = dict(
        b1=float(config.get("beta1", 0.5)),
        b2=float(config.get("beta2", 0.999)),
    )
    weight_decay = float(config.get("weight_decay", 0.0))
    g_tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.add_decayed_weights(weight_decay),
        optax.adam(float(config["lr"]), **optimizer_opts),
    )
    d_tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.add_decayed_weights(weight_decay),
        optax.adam(float(config["lr"]), **optimizer_opts),
    )

    state = AdversarialTrainState(
        g_params=g_vars["params"],
        g_batch_stats=g_vars.get("batch_stats", {}),
        g_noises=g_vars.get("noises", {}),
        d_params=d_vars["params"],
        reconstructor_variables=r_vars,
        g_opt=g_tx.init(g_vars["params"]),
        d_opt=d_tx.init(d_vars["params"]),
        step=jnp.zeros((), jnp.int32),
    )

    # reference updater builds PerceptualAndStyleLoss(use_style_loss=False)
    # (adversarial_updater.py:16)
    perceptual = PerceptualAndStyleLoss(use_style_loss=False)
    steps = make_adversarial_steps(
        generation_ae, discriminator, reconstruction_ae, g_tx, d_tx,
        perceptual,
        loss_weights=config.get("loss_weights"),
    )

    updater = AdversarialAutoencoderUpdater(
        steps, state,
        iterators={
            "original_images": EpochStream(real_loader, key="images"),
            "binary_images": EpochStream(fake_loader, key="images"),
        },
    )
    trainer = Trainer(updater, (int(config["max_iter"]), "iteration"),
                      log_dir=log_dir)
    save_run_config(log_dir, config, args)
    trainer.extend(
        Snapshotter(
            lambda t: {
                "generator": t.updater.state.g_params,
                "generator_batch_stats": t.updater.state.g_batch_stats,
                "discriminator": t.updater.state.d_params,
            },
            log_dir,
            trigger=(int(config.get("snapshot_save_iter", 10000)), "iteration"),
        )
    )
    # StyleImagePlotter equivalent (reference utils/style_image_plotter.py:8-16):
    # probe grid [binary | style | generated | reconstructed]
    from synthesis_in_style_tpu.core.extensions import ImagePlotter
    from synthesis_in_style_tpu.utils.dataset_creation import make_image as to_uint8

    probe_binary = jnp.asarray(next(iter(fake_loader))["images"][:4])
    probe_style = jnp.asarray(next(iter(real_loader))["images"][:4])

    def render_probe(t):
        import numpy as np

        state = t.updater.state
        variables = {"params": state.g_params}
        if state.g_batch_stats:
            variables["batch_stats"] = state.g_batch_stats
        if state.g_noises:
            variables["noises"] = state.g_noises
        fake = generation_ae.apply(
            variables, probe_binary, probe_style,
            rngs={"noise": jax.random.PRNGKey(0)},
        )
        recon = reconstruction_ae.apply(
            state.reconstructor_variables, fake,
            rngs={"noise": jax.random.PRNGKey(0)},
        )
        rows = [
            np.concatenate(
                [to_uint8(col[i]) for col in (probe_binary, probe_style, fake, recon)],
                axis=1,
            )
            for i in range(probe_binary.shape[0])
        ]
        return np.concatenate(rows, axis=0)

    trainer.extend(
        ImagePlotter(
            render_probe, log_dir,
            trigger=(int(config.get("image_save_iter", 1000)), "iteration"),
        )
    )
    trainer.extend(
        LogWriter(log_dir, trigger=(int(config.get("log_iter", 10)), "iteration"))
    )
    # live collapse monitor (VERDICT r4 #3) — D-loss signature only here
    # (no FID evaluator in the adversarial trainer); on by default
    alarm_cfg = dict(config.get("quality_alarm") or {})
    if alarm_cfg.pop("enabled", True):
        from synthesis_in_style_tpu.core.extensions import DivergenceAlarm

        alarm_cfg.setdefault("d_loss_key", "discriminator/loss")
        trainer.extend(DivergenceAlarm(
            trigger=(1, "epoch"), log_dir=log_dir, **alarm_cfg,
        ))
    trainer.train()


def build_parser() -> argparse.ArgumentParser:
    """Same surface as the reference parser
    (train_adversarial_generator.py:177-190): positional `config` then
    `autoencoder_checkpoint`, `-o/-f` short aliases, `--val-images`
    (accepted, unused in the reference main too), `-ln/--log-name`, and
    the torch-era plumbing flags as no-ops (cli/compat.py)."""
    from synthesis_in_style_tpu.cli.compat import add_torch_compat_args

    parser = argparse.ArgumentParser(
        description="Train an adversarial binary-to-styled-image generator"
    )
    parser.add_argument("config", help="path to yaml config to use for training")
    parser.add_argument("autoencoder_checkpoint")
    parser.add_argument("--overwrite-config", action="store_true", default=False)
    parser.add_argument("-o", "--original-images", required=True)
    parser.add_argument("-f", "--fake-images", required=True)
    parser.add_argument("--val-images", dest="val_images", default=None)
    parser.add_argument("--absolute", action="store_true", default=False)
    parser.add_argument("-l", "--log-dir", default="adversarial_training")
    parser.add_argument("-ln", "--log-name", default="training")
    parser.add_argument("--debug", action="store_true", default=False)
    add_torch_compat_args(parser, short_device=True)
    return parser


if __name__ == "__main__":
    from synthesis_in_style_tpu.cli.compat import warn_ignored_torch_args

    parsed = build_parser().parse_args()
    warn_ignored_torch_args(parsed)
    parsed.log_dir = os.path.join(
        "logs", parsed.log_dir, parsed.log_name,
        datetime.datetime.now().isoformat(),
    )
    main(parsed)
