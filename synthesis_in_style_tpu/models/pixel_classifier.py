"""DatasetGAN pixel classifiers — per-pixel MLPs over generator features.

Capability parity with the reference
(/root/reference/stylegan_code_finder/networks/pixel_classifier/model.py),
re-designed for TPU:

* `PixelClassifier`: dim→128→32→K MLP for K<32 else dim→256→128→K, with
  ReLU + BatchNorm1d after each hidden linear (reference :61-85) and
  normal(0, 0.02) weight init (reference init_weights :87-113).
* `PixelEnsembleClassifier` is NOT a dict of modules run in a Python loop
  (reference :13-49): the ensemble dimension is a leading axis on a stacked
  parameter pytree, and forward/predict are `jax.vmap` over it — all members
  run as one batched matmul on the MXU. Majority vote = one-hot count +
  argmin-index argmax, matching `torch.mode` tie-breaking (smallest class id
  wins).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class PixelClassifier(nn.Module):
    """Reference PixelClassifier (pixel_classifier/model.py:61-121). Input
    (B, dim) feature vectors; output (B, num_classes) logits."""

    num_classes: int

    @property
    def hidden_sizes(self) -> Tuple[int, int]:
        return (128, 32) if self.num_classes < 32 else (256, 128)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        init = nn.initializers.normal(stddev=0.02)
        h1, h2 = self.hidden_sizes
        x = nn.Dense(h1, kernel_init=init, name="fc1")(x)
        x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn1")(x)
        x = nn.Dense(h2, kernel_init=init, name="fc2")(x)
        x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn2")(x)
        return nn.Dense(self.num_classes, kernel_init=init, name="fc3")(x)


class PixelEnsembleClassifier:
    """Vmapped ensemble of PixelClassifiers (reference
    PixelEnsembleClassifier, model.py:13-49). Holds stacked variables with a
    leading (num_models,) axis."""

    def __init__(self, num_classes: int, dim: int, num_models: int,
                 seed: int = 0):
        self.num_classes = num_classes
        self.dim = dim
        self.num_models = num_models
        self.model = PixelClassifier(num_classes)
        if num_models > 0:
            keys = jax.random.split(jax.random.PRNGKey(seed), num_models)
            self.variables = jax.vmap(
                lambda k: self.model.init({"params": k}, jnp.zeros((1, dim)),
                                          train=False)
            )(keys)
        else:
            self.variables = None

    @classmethod
    def from_stacked_variables(cls, variables: Dict[str, Any],
                               num_classes: int) -> "PixelEnsembleClassifier":
        leaf = jax.tree_util.tree_leaves(variables["params"])[0]
        ensemble = cls.__new__(cls)
        ensemble.num_classes = num_classes
        ensemble.num_models = int(leaf.shape[0])
        ensemble.model = PixelClassifier(num_classes)
        ensemble.variables = variables
        ensemble.dim = variables["params"]["fc1"]["kernel"].shape[1]
        return ensemble

    def forward_all(self, x: Array, train: bool = False) -> Array:
        """(B, dim) -> (num_models, B, num_classes) logits, one vmapped
        apply. With train=True the BatchNorm batch-statistics update is
        computed and DISCARDED — the training step that owns the state
        (updaters/dataset_gan_updater.py) threads batch_stats itself."""
        if train:
            def apply_one(v):
                logits, _ = self.model.apply(
                    v, x, train=True, mutable=["batch_stats"]
                )
                return logits

            return jax.vmap(apply_one)(self.variables)
        return jax.vmap(
            lambda v: self.model.apply(v, x, train=False)
        )(self.variables)

    def predict_classes(self, x: Array) -> Array:
        """Majority vote over members (reference predict_classes :41-49 via
        torch.mode). (B, dim) -> (B,) class ids."""
        logits = self.forward_all(x)  # (M, B, K)
        votes = jnp.argmax(logits, axis=-1)  # (M, B)
        counts = jnp.sum(
            jax.nn.one_hot(votes, self.num_classes, dtype=jnp.int32), axis=0
        )  # (B, K)
        # argmax picks the smallest class id on ties == torch.mode semantics
        return jnp.argmax(counts, axis=-1)
