"""Data-parallel segmentation training over the 8-device virtual mesh —
something the reference never tested (SURVEY.md §4): batch-sharded jit with
replicated params; BatchNorm statistics and gradients sync implicitly."""

import pytest

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

pytestmark = pytest.mark.slow  # excluded from the quick lane (-m 'not slow')



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


def test_segmentation_updater_with_mesh_runs_sharded(tmp_path):
    """Updater-level data parallelism: SegmentationUpdater with a ("data",)
    mesh replicates state and shards batches (the wiring the train CLIs use
    via parallel.data_parallel_mesh)."""
    from synthesis_in_style_tpu.parallel import data_parallel_mesh
    from synthesis_in_style_tpu.updaters.segmentation_updater import (
        SegmentationUpdater,
    )

    batch = 8  # divisible by the 8 virtual devices
    model = DocUFCN(num_classes=2, encoder_dropout=0.0, decoder_dropout=0.0)
    tx = optax.adam(1e-3)
    state = create_seg_train_state(model, jax.random.PRNGKey(0), 16, tx)
    mesh = data_parallel_mesh(batch)
    assert mesh is not None and mesh.devices.size == 8

    rng = np.random.default_rng(0)
    def batches():
        while True:
            yield {
                "images": rng.normal(size=(batch, 16, 16, 3)).astype("f4"),
                "segmented": rng.integers(0, 2, (batch, 16, 16)),
            }

    updater = SegmentationUpdater(
        make_standard_train_step(model, tx, donate=False),
        state,
        iterators={"images": batches()},
        mesh=mesh,
    )
    updater.update_core()
    updater.update_core()
    # params stayed replicated across the mesh
    leaf = jax.tree_util.tree_leaves(updater.state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_data_parallel_mesh_refuses_indivisible_batch():
    import warnings

    from synthesis_in_style_tpu.parallel import data_parallel_mesh

    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        assert data_parallel_mesh(7) is None
    assert any("not divisible" in str(w.message) for w in caught)


def test_stylegan2_updater_with_mesh_runs_sharded():
    """Full GAN updater (D + regs + G + EMA) under a ("data",) mesh — the
    exact wiring cli/train_stylegan_2.py uses; latent draws inside the jitted
    steps carry sharding constraints so GSPMD shards the G-side compute."""
    from synthesis_in_style_tpu.models.stylegan2 import Discriminator, Generator
    from synthesis_in_style_tpu.parallel import data_parallel_mesh
    from synthesis_in_style_tpu.updaters.stylegan2_updater import (
        StyleGAN2Config,
        StyleGAN2Updater,
        create_gan_train_state,
    )

    batch, size = 8, 16
    gen = Generator(size=size, style_dim=32, n_mlp=2)
    disc = Discriminator(size=size)
    g_tx = optax.adam(1e-3)
    d_tx = optax.adam(1e-3)
    state = create_gan_train_state(
        gen, disc, jax.random.PRNGKey(0), size, g_tx, d_tx
    )
    mesh = data_parallel_mesh(batch)
    assert mesh is not None

    rng = np.random.default_rng(0)
    def batches():
        while True:
            yield rng.normal(size=(batch, size, size, 3)).astype("f4")

    updater = StyleGAN2Updater(
        gen, disc, g_tx, d_tx, state,
        iterators={"images": batches()},
        batch_size=batch,
        cfg=StyleGAN2Config(d_reg_every=2, g_reg_every=2),
        mesh=mesh,
    )
    for _ in range(2):
        updater.update_core()
    leaf = jax.tree_util.tree_leaves(updater.state.g_params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_maybe_initialize_distributed_gating(monkeypatch):
    """No-op without a multi-host indication; calls
    jax.distributed.initialize() (idempotently) when one is present
    (reference setup_distributed, train.py:59-62)."""
    from synthesis_in_style_tpu.parallel import maybe_initialize_distributed

    calls = []
    import jax

    monkeypatch.setattr(
        jax.distributed, "initialize", lambda *a, **k: calls.append(1)
    )
    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "SIS_MULTIHOST", "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(var, raising=False)
    maybe_initialize_distributed()
    assert calls == []

    monkeypatch.setenv("SIS_MULTIHOST", "1")
    maybe_initialize_distributed()
    assert calls == [1]

    # an already-initialized runtime (RuntimeError) must not propagate
    def _raise(*a, **k):
        raise RuntimeError("already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", _raise)
    maybe_initialize_distributed()


def test_maybe_initialize_distributed_single_host_pod_env(monkeypatch):
    """A single-worker TPU_WORKER_HOSTNAMES (as set by single-host TPU
    runtimes) must NOT trigger initialization; a multi-worker list must."""
    from synthesis_in_style_tpu.parallel import maybe_initialize_distributed

    calls = []
    import jax

    monkeypatch.setattr(
        jax.distributed, "initialize", lambda *a, **k: calls.append(1)
    )
    for var in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
                "SIS_MULTIHOST"):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    maybe_initialize_distributed()
    assert calls == []
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-0,host-1")
    maybe_initialize_distributed()
    assert calls == [1]
