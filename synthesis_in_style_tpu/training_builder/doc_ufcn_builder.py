"""DocUFCN train builder (reference
training_builder/doc_ufcn_train_builder.py:13-43: GradientClipAdam with
betas/weight_decay/lr from config, weighted-CE StandardUpdater)."""

from __future__ import annotations

import jax.numpy as jnp
import optax

from synthesis_in_style_tpu.models.doc_ufcn import get_doc_ufcn
from synthesis_in_style_tpu.training_builder.base import BaseTrainBuilder
from synthesis_in_style_tpu.updaters.segmentation_updater import (
    make_standard_train_step,
)


class DocUFCNTrainBuilder(BaseTrainBuilder):
    def _build_network(self):
        network_class = get_doc_ufcn(self.config.get("network_version", "base"))
        return network_class(
            num_classes=self.config.get("num_classes", 3),
            input_channels=self.config.get("input_dim", 3),
            # per-block remat (config key `remat`): memory lever for large
            # batch/resolution — measured 0.81x on wall clock at 256px/b8
            # (scripts/docufcn_roofline.py: recompute re-writes activations,
            # raising HBM traffic), so off by default
            remat=bool(self.config.get("remat", False)),
            # space-to-depth stem (config key `s2d_stem`): exact
            # re-lowering of encoder block 0 for the TPU 128-lane layout,
            # same parameter tree / checkpoints (tests/test_s2d_stem.py);
            # measured speedups in MEASUREMENTS.md "space-to-depth stem"
            # int: how many leading encoder blocks (true == 1)
            s2d_stem=int(self.config.get("s2d_stem", 0)),
            # space-to-depth decoder tail (config key `s2d_tail`): same
            # exact-re-lowering treatment for the decoder-side hotspots —
            # packed final upsample + skip concat + block-kernel classifier
            s2d_tail=bool(self.config.get("s2d_tail", False)),
        )

    def _build_optimizer(self) -> optax.GradientTransformation:
        """GradientClipAdam equivalent: global-norm clip then torch-style
        Adam with COUPLED L2 weight decay — wd*param is added to the
        gradient BEFORE the adaptive scaling (torch.optim.Adam semantics,
        reference doc_ufcn_train_builder.py:29-31), not adamw's decoupled
        post-scaling decay."""
        config = self.config
        return optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.add_decayed_weights(float(config.get("weight_decay", 0.0))),
            optax.adam(
                self.lr_schedule(),
                b1=float(config.get("beta1", 0.9)),
                b2=float(config.get("beta2", 0.999)),
            ),
        )

    def _make_train_step(self, tx):
        class_weights = self.config.get("class_weights")
        weights = jnp.asarray(class_weights) if class_weights is not None else None
        return make_standard_train_step(
            self.network, tx, class_weights=weights,
            compute_dtype=self.config.get("compute_dtype"),
            dropout_rng_impl=self.config.get("dropout_rng_impl"),
        )
