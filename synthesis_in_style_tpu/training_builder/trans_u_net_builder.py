"""TransUNet train builder (reference
training_builder/trans_u_net_train_builder.py:13-50: SGD with momentum +
weight decay, 0.5*CE + 0.5*Dice updater, optional original-JAX .npz
pretrained weights when not fine-tuning)."""

from __future__ import annotations

import copy

import jax
import jax.numpy as jnp
import numpy as np
import optax

from synthesis_in_style_tpu.models.trans_u_net import (
    VIT_CONFIGS,
    VisionTransformer,
    load_npz_weights,
)
from synthesis_in_style_tpu.training_builder.base import BaseTrainBuilder
from synthesis_in_style_tpu.updaters.segmentation_updater import (
    make_transunet_train_step,
)


class TransUNetTrainBuilder(BaseTrainBuilder):
    def _build_network(self):
        config = self.config
        transformer_config = copy.deepcopy(
            VIT_CONFIGS[config.get("pretrained_model_name", "R50-ViT-B_16")]()
        )
        transformer_config["n_classes"] = config["num_classes"]
        transformer_config["n_skip"] = config.get("num_skip_channels", 3)
        # "flash" routes self-attention through the tiled Pallas TPU kernel
        # (no HBM-materialized N x N scores; see models.trans_u_net.Attention)
        transformer_config["attention_impl"] = config.get(
            "attention_impl", "xla"
        )
        vit_patch = config.get("vit_patch_size", 16)
        if transformer_config["patches"].get("grid") is not None:
            transformer_config["patches"]["grid"] = (
                config["image_size"] // vit_patch,
                config["image_size"] // vit_patch,
            )
        return VisionTransformer(
            config=transformer_config,
            img_size=config["image_size"],
            num_classes=config["num_classes"],
        )

    def create_state(self):
        state = super().create_state()
        if self.fine_tune is None and self.config.get("pretrained_path"):
            weights = np.load(self.config["pretrained_path"])
            params = load_npz_weights(
                jax.tree_util.tree_map(np.asarray, state.params),
                weights,
                self.network.config,
            )
            state = state.replace(
                params=jax.tree_util.tree_map(jnp.asarray, params)
            )
        return state

    def _build_optimizer(self) -> optax.GradientTransformation:
        config = self.config
        chain = []
        wd = float(config.get("weight_decay", 0.0))
        if wd:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(
            optax.sgd(self.lr_schedule(), momentum=float(config.get("momentum", 0.9)))
        )
        return optax.chain(*chain)

    def _make_train_step(self, tx):
        return make_transunet_train_step(
            self.network, tx, num_classes=self.config["num_classes"],
            compute_dtype=self.config.get("compute_dtype"),
            dropout_rng_impl=self.config.get("dropout_rng_impl"),
        )
