"""Train builders: wire network + optimizer + train step + extensions per
architecture.

Capability parity with the reference builder contract
(/root/reference/stylegan_code_finder/training_builder/base_train_builder.py:21-102:
get_updater / get_optimizers / get_snapshotter / get_evaluator /
get_image_plotter / get_network), re-designed for the functional stack:

* networks/optimizers are flax modules + optax transforms, state is one
  `SegTrainState` pytree; no DDP wrapping — the train step is jitted over a
  batch-sharded mesh (parallel.mesh) so gradients sync implicitly.
* fine-tune loading restores orbax snapshots under the
  `segmentation_network` key (reference :37-38 + load_weights).
* the LR schedule is baked into the optimizer via optax.inject_hyperparams —
  clamped cosine or warm restarts selected by config (reference
  train.py:39-56).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from synthesis_in_style_tpu.core.extensions import (
    Evaluator,
    ImagePlotter,
    Snapshotter,
)
from synthesis_in_style_tpu.core.schedules import (
    clamped_cosine,
    constant,
    cosine_warm_restarts,
)
from synthesis_in_style_tpu.data.loader import EpochStream
from synthesis_in_style_tpu.models.base_segmenter import SegmenterConfig
from synthesis_in_style_tpu.updaters.segmentation_updater import (
    SegmentationUpdater,
    SegTrainState,
    create_seg_train_state,
)


class BaseTrainBuilder:
    network_key = "segmentation_network"

    def __init__(
        self,
        config: dict,
        train_data_loader=None,
        val_data_loader=None,
        seed: int = 0,
    ):
        self.config = config
        self.train_data_loader = train_data_loader
        self.val_data_loader = val_data_loader
        self.fine_tune = config.get("fine_tune")
        self.seed = seed
        self.network = self._build_network()
        self._tx: Optional[optax.GradientTransformation] = None
        self._state: Optional[SegTrainState] = None
        self._updater: Optional[SegmentationUpdater] = None

    # ---------------- abstract ----------------

    def _build_network(self):
        raise NotImplementedError

    def _make_train_step(self, tx) -> Callable:
        raise NotImplementedError

    def _base_lr(self) -> float:
        return float(self.config["lr"])

    # ---------------- schedule / optimizer ----------------

    def lr_schedule(self) -> Callable:
        """Reference get_scheduler (train.py:39-56): clamped cosine or warm
        restarts to end_lr over cosine_max_update_{epoch,iter}."""
        config = self.config
        if "cosine_max_update_epoch" in config:
            per_epoch = len(self.train_data_loader) if self.train_data_loader else 1
            cosine_end = config["cosine_max_update_epoch"] * max(1, per_epoch)
        elif "cosine_max_update_iter" in config:
            cosine_end = config["cosine_max_update_iter"]
        else:
            cosine_end = config.get("epochs", 1)
        end_lr = float(config.get("end_lr", 0.0))
        if config.get("warm_restarts"):
            return cosine_warm_restarts(self._base_lr(), cosine_end, eta_min=end_lr)
        if cosine_end:
            return clamped_cosine(self._base_lr(), cosine_end, eta_min=end_lr)
        return constant(self._base_lr())

    def _build_optimizer(self) -> optax.GradientTransformation:
        raise NotImplementedError

    @property
    def tx(self) -> optax.GradientTransformation:
        if self._tx is None:
            self._tx = self._build_optimizer()
        return self._tx

    # ---------------- state ----------------

    def segmenter_config(self) -> SegmenterConfig:
        if hasattr(self.network, "segmenter_config"):
            return self.network.segmenter_config()
        return SegmenterConfig(num_classes=self.config["num_classes"])

    def _initial_extra(self) -> Any:
        return None

    def create_state(self) -> SegTrainState:
        state = create_seg_train_state(
            self.network,
            jax.random.PRNGKey(self.seed),
            self.config["image_size"],
            self.tx,
            num_input_channels=self.config.get("input_dim", 3),
            extra=self._initial_extra(),
        )
        if self.fine_tune:
            state = self._load_fine_tune(state, self.fine_tune)
        if self.config.get("resume_ckpt"):
            state = self._load_resume(state, self.config["resume_ckpt"])
        return state

    def _load_fine_tune(self, state: SegTrainState, checkpoint) -> SegTrainState:
        from synthesis_in_style_tpu.utils.checkpoint import load_pytree

        tree = load_pytree(Path(checkpoint))
        net = tree[self.network_key]
        return state.replace(
            params=jax.tree_util.tree_map(jnp.asarray, net["params"]),
            batch_stats=jax.tree_util.tree_map(
                jnp.asarray, net.get("batch_stats", state.batch_stats)
            ),
            extra=jax.tree_util.tree_map(jnp.asarray, net["extra"])
            if "extra" in net and state.extra is not None
            else state.extra,
        )

    def _load_resume(self, state: SegTrainState, checkpoint) -> SegTrainState:
        """Full preemption resume: weights + BN stats + extra state + the
        optimizer (fine-tune deliberately restores weights only)."""
        from synthesis_in_style_tpu.utils.checkpoint import (
            load_pytree,
            restore_structured,
        )

        state = self._load_fine_tune(state, checkpoint)
        tree = load_pytree(Path(checkpoint))
        if "main_optimizer" in tree:
            state = state.replace(
                opt_state=restore_structured(
                    state.opt_state, tree["main_optimizer"]
                )
            )
        return state

    @property
    def state(self) -> SegTrainState:
        if self._state is None:
            self._state = self.create_state()
        return self._state

    # ---------------- trainer wiring ----------------

    def get_updater(self) -> SegmentationUpdater:
        if self._updater is None:
            from synthesis_in_style_tpu.parallel import data_parallel_mesh

            self._updater = SegmentationUpdater(
                self._make_train_step(self.tx),
                self.state,
                iterators={"images": EpochStream(self.train_data_loader)},
                seed=self.seed,
                mesh=data_parallel_mesh(self.train_data_loader.batch_size),
            )
        return self._updater

    def snapshot_state(self, trainer) -> Dict[str, Any]:
        state = trainer.updater.state
        net = {"params": state.params, "batch_stats": state.batch_stats}
        if state.extra is not None:
            net["extra"] = state.extra
        return {self.network_key: net, "main_optimizer": state.opt_state}

    def get_snapshotter(self, log_dir=None) -> Snapshotter:
        log_dir = log_dir or self.config["log_dir"]
        return Snapshotter(
            self.snapshot_state,
            log_dir,
            trigger=(self.config.get("snapshot_save_iter", 1000), "iteration"),
        )

    # ---------------- evaluation / plotting ----------------

    def _predict_logits(self, state: SegTrainState, images):
        if not hasattr(self, "_predict_logits_jit"):
            def apply_fn(params, batch_stats, images):
                variables = {"params": params}
                if batch_stats:
                    variables["batch_stats"] = batch_stats
                return self.network.apply(variables, images, train=False)

            self._predict_logits_jit = jax.jit(apply_fn)
        return self._predict_logits_jit(state.params, state.batch_stats, images)

    def get_evaluator(self) -> Optional[Evaluator]:
        if self.val_data_loader is None:
            return None
        from synthesis_in_style_tpu.evaluation.metrics import (
            calculate_confusion_matrix,
            calculate_metric,
        )

        num_classes = self.segmenter_config().num_classes
        class_names = list(self._class_names())

        def eval_fn(trainer):
            state = trainer.updater.state
            confusion = np.zeros((num_classes, num_classes))
            for batch in self.val_data_loader:
                logits = self._predict_logits(state, jnp.asarray(batch["images"]))
                pred = jnp.argmax(logits, axis=-1)
                confusion += calculate_confusion_matrix(
                    batch["segmented"], pred, num_classes
                )
            out = {}
            for metric in ("dice", "iou"):
                scores = calculate_metric(confusion, class_names, metric)
                out[f"{metric}_weighted_avg"] = scores["weighted_avg"]["score"]
                out[f"{metric}_weighted_text_avg"] = scores["weighted_text_avg"]["score"]
            return out

        return Evaluator(
            eval_fn, trigger=(1, "epoch"), prefix="evaluation"
        )

    def _class_names(self):
        import json

        path = self.config.get("class_to_color_map")
        if path and Path(path).exists():
            with open(path) as f:
                return list(json.load(f).keys())
        return [f"class_{i}" for i in range(self.segmenter_config().num_classes)]

    def get_image_plotter(self, log_dir=None) -> Optional[ImagePlotter]:
        loader = self.val_data_loader or self.train_data_loader
        if loader is None:
            return None
        from synthesis_in_style_tpu.data.loader import fill_plot_images
        from synthesis_in_style_tpu.visualization.segmentation_plotter import (
            render_segmentation_grid,
        )

        plot_images = fill_plot_images(
            loader, num_desired_images=self.config.get("display_size", 4)
        )
        inputs = np.stack(plot_images["images"])
        labels = np.stack(plot_images["segmented"])
        import json

        with open(self.config["class_to_color_map"]) as f:
            color_map = json.load(f)

        def render_fn(trainer):
            logits = self._predict_logits(
                trainer.updater.state, jnp.asarray(inputs)
            )
            return render_segmentation_grid(
                inputs, labels, np.asarray(logits), color_map
            )

        return ImagePlotter(
            render_fn,
            log_dir or self.config["log_dir"],
            trigger=(self.config.get("image_save_iter", 1000), "iteration"),
        )

    # ---------------- inference loading ----------------

    def get_network_for_inference(
        self, checkpoint
    ) -> Tuple[Any, Dict, SegmenterConfig]:
        """(module, variables, segmenter_config) from an orbax snapshot
        (reference load_network, analysis_segmenter.py:72-81)."""
        from synthesis_in_style_tpu.utils.checkpoint import load_pytree

        tree = load_pytree(Path(checkpoint))
        net = tree[self.network_key]
        variables = {"params": jax.tree_util.tree_map(jnp.asarray, net["params"])}
        if net.get("batch_stats"):
            variables["batch_stats"] = jax.tree_util.tree_map(
                jnp.asarray, net["batch_stats"]
            )
        return self.network, variables, self.segmenter_config()


