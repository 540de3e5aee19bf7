"""GAN train CLI end-to-end on a tiny dataset: losses logged, snapshot in
the reference key layout, sample plot written, resume works (reference
train_stylegan_2.py)."""

import pytest
import json

import numpy as np
import yaml
from PIL import Image

from synthesis_in_style_tpu.cli import train_stylegan_2 as gan_cli
from synthesis_in_style_tpu.utils.checkpoint import latest_snapshot, load_pytree

pytestmark = pytest.mark.slow  # excluded from the quick lane (-m 'not slow')




def _make_dataset(tmp_path, n=6, size=32):
    rng = np.random.default_rng(0)
    files = []
    for i in range(n):
        Image.fromarray(
            rng.integers(0, 255, (size, size, 3), np.uint8)
        ).save(tmp_path / f"img_{i}.png")
        files.append(f"img_{i}.png")
    (tmp_path / "train.json").write_text(json.dumps(files))
    return tmp_path / "train.json"


def test_gan_train_cli(tmp_path):
    train_json = _make_dataset(tmp_path)
    config = {
        "image_size": 32,
        "latent_size": 32,
        "n_mlp": 2,
        "channel_multiplier": 1,
        "stylegan_variant": 2,
        "batch_size": 2,
        "lr": 2e-3,
        "max_iter": 5,
        "snapshot_save_iter": 5,
        "image_save_iter": 4,
        "log_iter": 1,
        "num_workers": 1,
        "style_mixing_prob": 0.9,
        "regularization": {
            "g_interval": 4, "d_interval": 4,
            "r1_weight": 10, "path_reg_weight": 2,
        },
    }
    config_path = tmp_path / "config.yaml"
    config_path.write_text(yaml.dump(config))

    log_dir = tmp_path / "logs"
    args = gan_cli.build_parser().parse_args(
        [str(config_path), "--images", str(train_json), "--debug"]
    )
    args.log_dir = str(log_dir)
    gan_cli.main(args)

    snapshot = latest_snapshot(log_dir / "checkpoints")
    assert snapshot is not None
    tree = load_pytree(snapshot)
    assert {
        "generator", "discriminator", "g_ema", "generator_optimizer",
        "discriminator_optimizer", "g_noises",
    } <= set(tree)

    log_lines = [
        json.loads(line) for line in (log_dir / "log.jsonl").read_text().splitlines()
    ]
    assert any("train/discriminator_loss" in e for e in log_lines)
    assert any("train/generator_loss" in e for e in log_lines)
    assert any("train/r1_penalty" in e for e in log_lines)
    assert any("train/path_loss" in e for e in log_lines)
    assert list((log_dir / "images").glob("*.png"))

    # resume path: the snapshot round-trips into a fresh train state via the
    # SAME function the CLI uses, restoring noise buffers and Adam moments
    import jax
    import jax.numpy as jnp
    import numpy as np

    from synthesis_in_style_tpu.models.factory import get_discriminator, get_generator
    from synthesis_in_style_tpu.updaters.stylegan2_updater import (
        create_gan_train_state,
        restore_gan_snapshot,
    )

    gen = get_generator(config)
    disc = get_discriminator(config)
    g_tx, d_tx, _ = gan_cli.build_gan_optimizers(config)
    state = create_gan_train_state(
        gen, disc, jax.random.PRNGKey(0), config["image_size"], g_tx, d_tx
    )
    resumed = restore_gan_snapshot(state, tree)
    # noise buffers come from the snapshot, not the fresh init
    for name, buf in tree["g_noises"].items():
        np.testing.assert_array_equal(
            np.asarray(resumed.g_noises[name]), np.asarray(buf)
        )
    # optimizer moments restored: at least one Adam moment leaf is nonzero
    # after training, and the restored structure matches the fresh one
    assert jax.tree_util.tree_structure(resumed.g_opt) == (
        jax.tree_util.tree_structure(state.g_opt)
    )
    moments = [
        np.abs(np.asarray(leaf)).sum()
        for leaf in jax.tree_util.tree_leaves(resumed.g_opt)
        if hasattr(leaf, "ndim") and leaf.ndim > 0
    ]
    assert any(m > 0 for m in moments)
    img, _ = gen.apply(
        {"params": resumed.g_ema, "noises": resumed.g_noises},
        [jnp.zeros((1, config["latent_size"]))],
        randomize_noise=False,
    )
    assert img.shape == (1, 32, 32, 3)


def test_gan_train_cli_resumes_from_reference_pt(tmp_path):
    """--resume-ckpt with a reference-layout torch .pt (reference
    train_stylegan_2.py:75-77): weights convert + load, training proceeds."""
    import pytest

    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    from reference_loader import REFERENCE, load_reference_stylegan

    if not REFERENCE.exists():
        pytest.skip("reference repo not mounted")

    ref_mod = load_reference_stylegan("stylegan2")
    torch.manual_seed(0)
    ref_gen = ref_mod.Generator(32, 32, 2, channel_multiplier=1)
    ref_disc = ref_mod.Discriminator(32, channel_multiplier=1)
    ref_ema = ref_mod.Generator(32, 32, 2, channel_multiplier=1)
    ckpt_path = tmp_path / "reference.pt"
    torch.save(
        {
            "generator": ref_gen.state_dict(),
            "discriminator": ref_disc.state_dict(),
            "g_ema": ref_ema.state_dict(),
        },
        ckpt_path,
    )

    # the converted g_ema actually lands in the train state
    import jax
    import jax.numpy as jnp

    from synthesis_in_style_tpu.models.factory import get_discriminator, get_generator
    from synthesis_in_style_tpu.updaters.stylegan2_updater import (
        create_gan_train_state,
        restore_gan_snapshot,
    )
    from synthesis_in_style_tpu.utils.checkpoint import (
        gan_snapshot_tree_from_torch,
        load_torch_checkpoint,
        torch_generator_to_flax,
    )

    config = {
        "image_size": 32, "latent_size": 32, "n_mlp": 2,
        "channel_multiplier": 1, "stylegan_variant": 2,
    }
    gen = get_generator(config)
    disc = get_discriminator(config)
    import optax

    state = create_gan_train_state(
        gen, disc, jax.random.PRNGKey(0), 32,
        optax.adam(1e-3), optax.adam(1e-3),
    )
    tree = gan_snapshot_tree_from_torch(load_torch_checkpoint(ckpt_path))
    resumed = restore_gan_snapshot(state, tree)
    expected = torch_generator_to_flax(
        {k: v.numpy() for k, v in ref_ema.state_dict().items()}
    )
    for ours, theirs in zip(
        jax.tree_util.tree_leaves(resumed.g_ema),
        jax.tree_util.tree_leaves(expected["params"]),
    ):
        np.testing.assert_array_equal(np.asarray(ours), np.asarray(theirs))

    # end-to-end: CLI trains from the .pt without error
    train_json = _make_dataset(tmp_path)
    config.update({
        "batch_size": 2, "lr": 2e-3, "max_iter": 2,
        "snapshot_save_iter": 2, "image_save_iter": 2, "log_iter": 1,
        "num_workers": 1, "style_mixing_prob": 0.9,
        "regularization": {"g_interval": 2, "d_interval": 2,
                           "r1_weight": 10, "path_reg_weight": 2},
    })
    config_path = tmp_path / "config.yaml"
    config_path.write_text(yaml.dump(config))
    log_dir = tmp_path / "logs_pt_resume"
    args = gan_cli.build_parser().parse_args(
        [str(config_path), "--images", str(train_json), "--debug",
         "--resume-ckpt", str(ckpt_path)]
    )
    args.log_dir = str(log_dir)
    gan_cli.main(args)
    assert latest_snapshot(log_dir / "checkpoints") is not None


def test_restore_structured_matches_fields_by_name(tmp_path):
    """Optimizer-state restore must match namedtuple fields by NAME, not by
    sorted-leaf order — a state whose field order differs from alphabetical
    would silently scramble moments under order-based unflattening."""
    import collections

    import jax
    import jax.numpy as jnp

    from synthesis_in_style_tpu.utils.checkpoint import (
        restore_structured,
        save_pytree,
        load_pytree,
    )

    # field order (zebra, alpha) is the REVERSE of alphabetical
    Tricky = collections.namedtuple("Tricky", ["zebra", "alpha"])
    state = (
        Tricky(zebra=jnp.full((2,), 7.0), alpha=jnp.full((2,), 1.0)),
        (),  # empty stage, like optax.EmptyState
        {"mu": {"w": jnp.arange(3.0)}, "count": jnp.int32(5)},
    )
    snap = tmp_path / "snap"
    save_pytree(snap, {"opt": state})
    loaded = load_pytree(snap)["opt"]

    restored = restore_structured(state, loaded)
    assert isinstance(restored[0], Tricky)
    np.testing.assert_array_equal(np.asarray(restored[0].zebra), 7.0)
    np.testing.assert_array_equal(np.asarray(restored[0].alpha), 1.0)
    np.testing.assert_array_equal(
        np.asarray(restored[2]["mu"]["w"]), np.arange(3.0)
    )
    assert int(restored[2]["count"]) == 5
    assert jax.tree_util.tree_structure(restored) == (
        jax.tree_util.tree_structure(state)
    )

    # shape mismatch is an error, not a silent scramble
    bad = Tricky(zebra=jnp.zeros((3,)), alpha=jnp.zeros((2,)))
    with __import__("pytest").raises(AssertionError):
        restore_structured((bad, (), state[2]), loaded)


def test_torch_checkpoint_without_known_keys_raises():
    """A .pt with no generator/discriminator/g_ema key must raise, not
    convert to an empty tree that restore_gan_snapshot silently ignores
    (which would start a 'resumed' run from random init)."""
    import numpy as np
    import pytest

    from synthesis_in_style_tpu.utils.checkpoint import (
        gan_snapshot_tree_from_torch,
    )

    bogus = {"g": {"w": np.zeros(3)}, "state_dict": {"x": np.ones(2)}}
    with pytest.raises(KeyError, match="generator/discriminator/g_ema"):
        gan_snapshot_tree_from_torch(bogus)
