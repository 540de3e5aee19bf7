"""PixelEnsemble (DatasetGAN) train builder (reference
training_builder/pixel_ensemble_train_builder.py:20-112): one GradientClipAdam
per ensemble member — here one vmapped optimizer over the stacked member
axis — plus the dice evaluator and the DatasetGAN plotter."""

from __future__ import annotations

from typing import Optional

import optax

from synthesis_in_style_tpu.core.extensions import Evaluator, ImagePlotter, Snapshotter
from synthesis_in_style_tpu.models.base_segmenter import SegmenterConfig
from synthesis_in_style_tpu.models.pixel_classifier import PixelEnsembleClassifier
from synthesis_in_style_tpu.training_builder.base import BaseTrainBuilder
from synthesis_in_style_tpu.updaters.dataset_gan_updater import DatasetGANUpdater


class PixelEnsembleTrainBuilder(BaseTrainBuilder):
    @property
    def train_dataset(self):
        loader = self.train_data_loader
        return getattr(loader, "dataset", loader)

    def _build_network(self) -> PixelEnsembleClassifier:
        dataset = self.train_dataset
        get_len = getattr(dataset, "get_feature_vector_length", None)
        if get_len is None:
            raise RuntimeError(
                'The given dataset does not seem to implement the '
                '"get_feature_vector_length" method. However, this is '
                "required for initializing the PixelEnsemble classifier"
            )
        ensemble = PixelEnsembleClassifier(
            self.config.get("numpy_class", self.config.get("num_classes", 3)),
            get_len(),
            self.config["num_models"],
            seed=self.seed,
        )
        if self.fine_tune:
            # resume the stacked ensemble variables from a snapshot
            # (reference fine-tune loading, base_train_builder.py:37-38)
            import jax
            import jax.numpy as jnp

            from synthesis_in_style_tpu.utils.checkpoint import load_pytree

            tree = load_pytree(self.fine_tune)
            assert "pixel_ensemble" in tree, (
                f"fine-tune snapshot {self.fine_tune} has no 'pixel_ensemble'"
            )
            ensemble.variables = jax.tree_util.tree_map(
                jnp.asarray, tree["pixel_ensemble"]
            )
        return ensemble

    def segmenter_config(self) -> SegmenterConfig:
        return SegmenterConfig(num_classes=self.network.num_classes)

    def _build_optimizer(self) -> optax.GradientTransformation:
        config = self.config
        # torch-style coupled L2 (wd*param into the gradient before the
        # adaptive scaling), matching reference GradientClipAdam
        return optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.add_decayed_weights(float(config.get("weight_decay", 0.0))),
            optax.adam(
                float(config["lr"]),
                b1=float(config.get("beta1", 0.9)),
                b2=float(config.get("beta2", 0.999)),
            ),
        )

    def get_updater(self) -> DatasetGANUpdater:
        if self._updater is None:
            dataset = self.train_dataset
            iterator = _EpochAwareBatches(
                dataset.sample_pixel_batches(self.config["batch_size"], self.seed),
                dataset,
                self.config["batch_size"],
            )
            self._updater = DatasetGANUpdater(
                self.network,
                self.tx,
                iterators={"feature_vectors": iterator},
                dataset=dataset
                if hasattr(dataset, "reset_dataset")
                else None,
                seed=self.seed,
            )
        return self._updater

    def snapshot_state(self, trainer):
        state = trainer.updater.state
        return {
            "pixel_ensemble": state.variables,
            "ensemble_optimizer": state.opt_state,
        }

    def get_evaluator(self) -> Optional[Evaluator]:
        if self.val_data_loader is None:
            print("No validation dataset is given. Omitting Evaluator...")
            return None
        from synthesis_in_style_tpu.evaluation.dataset_gan_evaluator import (
            make_dataset_gan_eval_fn,
        )

        val_dataset = getattr(self.val_data_loader, "dataset", self.val_data_loader)

        def val_batches():
            n = val_dataset.pixel_labels.shape[0]
            f = val_dataset.feature_vector_length
            for i in range(n):
                yield {
                    "activations": val_dataset.pixel_activations[i].reshape(-1, f),
                    "label": val_dataset.pixel_labels[i].reshape(-1),
                }

        return Evaluator(
            make_dataset_gan_eval_fn(self.network, val_batches),
            trigger=(1, "epoch"),
        )

    def get_image_plotter(self, log_dir=None) -> Optional[ImagePlotter]:
        import json

        from synthesis_in_style_tpu.visualization.dataset_gan_plotter import (
            render_dataset_gan_grid,
        )

        dataset = self.train_dataset
        images, acts, labels = dataset.get_images_for_plot(
            self.config.get("display_size", 4)
        )
        if not images:
            return None
        with open(self.config["class_to_color_map"]) as f:
            color_map = json.load(f)

        def render_fn(trainer):
            return render_dataset_gan_grid(
                images, acts, labels, self.network, color_map
            )

        return ImagePlotter(
            render_fn,
            log_dir or self.config["log_dir"],
            trigger=(self.config.get("image_save_iter", 1000), "iteration"),
        )


class _EpochAwareBatches:
    def __init__(self, iterator, dataset, batch_size):
        self._iterator = iterator
        self._dataset = dataset
        self._batch_size = batch_size

    def __next__(self):
        return next(self._iterator)

    def __iter__(self):
        return self

    @property
    def epoch(self) -> float:
        return getattr(self._dataset, "epoch", 0.0)
