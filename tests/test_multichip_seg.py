"""Data-parallel segmentation training over the 8-device virtual mesh —
something the reference never tested (SURVEY.md §4): batch-sharded jit with
replicated params; BatchNorm statistics and gradients sync implicitly."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from synthesis_in_style_tpu.models.doc_ufcn import DocUFCN
from synthesis_in_style_tpu.parallel import make_mesh, replicate, shard_batch
from synthesis_in_style_tpu.updaters.segmentation_updater import (
    create_seg_train_state,
    make_standard_train_step,
)


def test_docufcn_dp_train_step(eight_devices):
    mesh = make_mesh(8)
    model = DocUFCN(num_classes=2, encoder_dropout=0.0, decoder_dropout=0.0)
    tx = optax.sgd(1e-2)  # sgd: updates proportional to grads, so the
    # sharded-vs-single comparison isn't hit by adam's sign amplification
    state = create_seg_train_state(model, jax.random.PRNGKey(0), 16, tx)
    state = replicate(mesh, state)
    step = make_standard_train_step(model, tx, donate=False)

    rng = np.random.default_rng(0)
    batch = {
        "images": shard_batch(
            mesh, rng.normal(size=(16, 16, 16, 3)).astype(np.float32)
        ),
        "segmented": shard_batch(
            mesh, rng.integers(0, 2, (16, 16, 16)).astype(np.int32)
        ),
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["softmax"]))

    # global-batch equivalence: the sharded step must match a single-device
    # step on the identical global batch (incl. BatchNorm statistics)
    state_single = create_seg_train_state(model, jax.random.PRNGKey(0), 16, tx)
    batch_single = {
        k: jnp.asarray(np.asarray(v)) for k, v in batch.items()
    }
    single_state, single_metrics = step(
        state_single, batch_single, jax.random.PRNGKey(1)
    )
    np.testing.assert_allclose(
        float(metrics["softmax"]), float(single_metrics["softmax"]), rtol=1e-4
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(new_state.params),
        jax.tree_util.tree_leaves(single_state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4
        )
