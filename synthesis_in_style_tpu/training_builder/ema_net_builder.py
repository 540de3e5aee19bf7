"""EMANet train builder (reference
training_builder/ema_net_train_builder.py:26-48: SGD with momentum and three
param groups — conv kernels (lr, weight decay), BN scales (lr, no decay),
all biases (2x lr, no decay) — per ema_net/utils.py get_params :7-21)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from synthesis_in_style_tpu.models.ema_net import EMANet
from synthesis_in_style_tpu.training_builder.base import BaseTrainBuilder
from synthesis_in_style_tpu.updaters.segmentation_updater import (
    make_emanet_train_step,
)


def _param_group(path) -> str:
    leaf = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    if leaf == "kernel":
        return "1x"
    if leaf == "scale":
        return "1y"
    return "2x"  # biases (conv + BN)


class EMANetTrainBuilder(BaseTrainBuilder):
    def _build_network(self):
        return EMANet(
            num_classes=self.config["num_classes"],
            n_layers=self.config.get("n_layers", 50),
            stride=self.config.get("stride", 8),
            # exact space-to-depth stem re-lowering (config key `s2d_stem`,
            # same parameter tree/checkpoints — tests/test_s2d_stem.py)
            s2d_stem=bool(self.config.get("s2d_stem", False)),
        )

    def _initial_extra(self):
        return self.network.init_mu(seed=self.seed)

    def _build_optimizer(self) -> optax.GradientTransformation:
        schedule = self.lr_schedule()
        momentum = float(self.config.get("lr_mom", 0.9))
        weight_decay = float(self.config.get("weight_decay", 0.0))

        def sgd(lr_scale: float, wd: float):
            chain = []
            if wd:
                chain.append(optax.add_decayed_weights(wd))
            chain.append(optax.sgd(lambda step: lr_scale * schedule(step),
                                   momentum=momentum))
            return optax.chain(*chain)

        transforms = {
            "1x": sgd(1.0, weight_decay),
            "1y": sgd(1.0, 0.0),
            "2x": sgd(2.0, 0.0),
        }

        def label_fn(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: _param_group(path), params
            )

        return optax.multi_transform(transforms, label_fn)

    def _make_train_step(self, tx):
        return make_emanet_train_step(
            self.network, tx, em_mom=float(self.config.get("em_mom", 0.9)),
            compute_dtype=self.config.get("compute_dtype"),
            dropout_rng_impl=self.config.get("dropout_rng_impl"),
        )

    def _predict_logits(self, state, images):
        if not hasattr(self, "_predict_logits_jit"):
            def apply_fn(params, batch_stats, mu, images):
                variables = {"params": params}
                if batch_stats:
                    variables["batch_stats"] = batch_stats
                return self.network.apply(variables, images, mu, train=False)

            self._predict_logits_jit = jax.jit(apply_fn)
        return self._predict_logits_jit(
            state.params, state.batch_stats, state.extra, images
        )
