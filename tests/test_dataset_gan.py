"""DatasetGAN path end-to-end: activation-dataset CLI → hand labels →
ensemble training → DatasetGANSegmenter synthesis (reference call stack for
the PixelEnsemble/DatasetGAN variant)."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from PIL import Image

from synthesis_in_style_tpu.models.pixel_classifier import (
    PixelClassifier,
    PixelEnsembleClassifier,
)

CLASS_TO_COLOR = {
    "background": "#000000",
    "printed_text": "#0000FF",
    "handwritten_text": "#FF0000",
}


def test_pixel_classifier_arch_switch():
    small = PixelClassifier(num_classes=3)
    assert small.hidden_sizes == (128, 32)
    big = PixelClassifier(num_classes=40)
    assert big.hidden_sizes == (256, 128)


def test_ensemble_vote_majority():
    ensemble = PixelEnsembleClassifier(num_classes=3, dim=8, num_models=5)
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 8))
    logits = ensemble.forward_all(x)
    assert logits.shape == (5, 16, 3)
    votes = ensemble.predict_classes(x)
    assert votes.shape == (16,)
    # majority agrees with the per-member mode
    member_votes = np.asarray(jnp.argmax(logits, axis=-1))
    for i in range(16):
        counts = np.bincount(member_votes[:, i], minlength=3)
        assert votes[i] == np.argmax(counts)


def test_ensemble_train_step_separates_classes():
    from synthesis_in_style_tpu.updaters.dataset_gan_updater import (
        create_ensemble_train_state,
        make_ensemble_train_step,
    )

    rng = np.random.default_rng(0)
    # two linearly separable blobs
    x0 = rng.normal(size=(128, 8)).astype(np.float32) + 3
    x1 = rng.normal(size=(128, 8)).astype(np.float32) - 3
    x = np.concatenate([x0, x1])
    y = np.concatenate([np.zeros(128, np.int32), np.ones(128, np.int32)])

    ensemble = PixelEnsembleClassifier(num_classes=2, dim=8, num_models=3)
    tx = optax.adam(1e-2)
    state = create_ensemble_train_state(ensemble, tx)
    step = make_ensemble_train_step(ensemble.model, tx, donate=False)
    batch = {"activations": jnp.asarray(x), "label": jnp.asarray(y)}
    for _ in range(30):
        state, losses = step(state, batch)
    assert losses.shape == (3,)
    assert float(jnp.max(losses)) < 0.1
    ensemble.variables = state.variables
    acc = np.mean(np.asarray(ensemble.predict_classes(jnp.asarray(x))) == y)
    assert acc > 0.95


def test_torch_pixel_classifier_conversion():
    from synthesis_in_style_tpu.segmentation.dataset_gan_segmenter import (
        _torch_pixel_classifier_to_flax,
    )

    rng = np.random.default_rng(0)
    dim, k = 8, 3
    sd = {
        "layers.0.weight": rng.normal(size=(128, dim)),
        "layers.0.bias": rng.normal(size=(128,)),
        "layers.2.weight": np.ones(128),
        "layers.2.bias": np.zeros(128),
        "layers.2.running_mean": np.zeros(128),
        "layers.2.running_var": np.ones(128),
        "layers.3.weight": rng.normal(size=(32, 128)),
        "layers.3.bias": rng.normal(size=(32,)),
        "layers.5.weight": np.ones(32),
        "layers.5.bias": np.zeros(32),
        "layers.5.running_mean": np.zeros(32),
        "layers.5.running_var": np.ones(32),
        "layers.6.weight": rng.normal(size=(k, 32)),
        "layers.6.bias": rng.normal(size=(k,)),
    }
    variables = _torch_pixel_classifier_to_flax(sd)
    model = PixelClassifier(num_classes=k)
    out = model.apply(
        jax.tree_util.tree_map(jnp.asarray, variables),
        jnp.asarray(rng.normal(size=(4, dim)).astype(np.float32)),
        train=False,
    )
    assert out.shape == (4, k)


@pytest.mark.slow  # >20s on the 1-core host; full lane only
def test_dataset_gan_end_to_end(tmp_path):
    """Full DatasetGAN variant: activation CLI -> labels -> ensemble train
    CLI -> segmenter-based dataset synthesis."""
    from synthesis_in_style_tpu.cli import (
        create_dataset_for_activation_classification as cdac,
    )
    from synthesis_in_style_tpu.cli import create_dataset_for_segmentation as cds
    from synthesis_in_style_tpu.cli import train as train_cli
    from synthesis_in_style_tpu.models.stylegan2 import Generator
    from synthesis_in_style_tpu.utils.checkpoint import latest_snapshot, save_pytree

    SIZE, STYLE = 32, 32
    run_dir = tmp_path / "run"
    ckpt = run_dir / "checkpoints" / "iter_00000001"
    gen_config = {
        "image_size": SIZE, "latent_size": STYLE, "n_mlp": 2,
        "stylegan_variant": 2, "batch_size": 4,
    }
    (run_dir / "config").mkdir(parents=True)
    (run_dir / "config" / "config.json").write_text(json.dumps(gen_config))
    gen = Generator(size=SIZE, style_dim=STYLE, n_mlp=2)
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        [jnp.zeros((1, STYLE))],
    )
    save_pytree(ckpt, {"g_ema": variables["params"], "g_noises": variables["noises"]})

    # --- stage 1: activation dataset
    acts_dir = tmp_path / "acts"
    args = cdac.build_parser().parse_args(
        [str(ckpt), str(acts_dir), "-n", "6", "-b", "3",
         "--save-latents", "--save-activations", "-ge"]
    )
    cdac.main(args)
    assert (acts_dir / "tensors.npz").exists()
    full_data = json.loads((acts_dir / "full_data.json").read_text())
    assert len(full_data) == 6

    # --- stage 2: "hand label" — paint a square of printed_text
    for entry in full_data:
        label = np.zeros((SIZE, SIZE, 3), np.uint8)
        label[8:20, 8:20] = (0, 0, 255)
        Image.fromarray(label).save(acts_dir / entry["label"])

    colors_path = tmp_path / "colors.json"
    colors_path.write_text(json.dumps(CLASS_TO_COLOR))

    # --- stage 3: ensemble training through the train CLI
    import yaml

    train_config = {
        "network": "PixelEnsemble",
        "dataset": "dataset_gan",
        "num_classes": 3,
        "numpy_class": 3,
        "num_models": 2,
        "image_size": SIZE,
        "batch_size": 256,
        "tensor_path": str(acts_dir / "tensors.npz"),
        "generate": False,
        "upsample_mode": "bilinear",
        "class_probability": [0.34, 0.33, 0.33],
        "random_sampling": True,
        "lr": 1e-3,
        "weight_decay": 0.0,
        "max_iter": 5,
        "snapshot_save_iter": 5,
        "image_save_iter": 1000,
        "log_iter": 1,
        "display_size": 2,
        "epochs": 1,
        "num_workers": 1,
    }
    config_path = tmp_path / "train_config.yaml"
    config_path.write_text(yaml.dump(train_config))
    log_dir = tmp_path / "ensemble_logs"
    targs = train_cli.build_parser().parse_args(
        [str(config_path), "--images", str(acts_dir / "train.json"),
         "--class-to-color-map", str(colors_path), "--debug"]
    )
    targs.log_dir = str(log_dir)
    train_cli.main(targs)
    snapshot = latest_snapshot(log_dir / "checkpoints")
    assert snapshot is not None

    # --- stage 4: dataset synthesis with the DatasetGAN segmenter
    creation_config = {
        "class_to_color_map": CLASS_TO_COLOR,
        "segmenter_type": "dataset_gan",
        "seed": 1,
    }
    creation_path = tmp_path / "creation.json"
    creation_path.write_text(json.dumps(creation_config))
    cargs = cds.build_parser().parse_args(
        [str(ckpt), str(creation_path), "-n", "4", "-b", "4",
         "--classifier-path", str(snapshot),
         "-s", str(tmp_path / "synth")]
    )
    cds.main(cargs)
    pngs = list((tmp_path / "synth").glob("**/*.png"))
    assert len(pngs) >= 4
    assert (tmp_path / "synth" / "coco_gt.json").exists()


def test_generation_dataset_reset_refreshes_batches(tmp_path):
    """reset_dataset() must change the batches the training stream serves —
    a captured flattened view would silently keep epoch-1 activations."""
    import json as _json

    from synthesis_in_style_tpu.data.dataset_gan_dataset import (
        DatasetGANGenerationDataset,
    )

    rng = np.random.default_rng(0)
    latents = rng.normal(size=(2, 4)).astype(np.float32)
    np.savez(tmp_path / "tensors.npz", latent_codes=latents,
             activations=np.asarray([], dtype=object))
    for i in range(2):
        label = np.zeros((8, 8, 3), np.uint8)
        Image.fromarray(label).save(tmp_path / f"label_{i}.png")
    manifest = [
        {"image": f"label_{i}.png", "label": f"label_{i}.png", "latent": i}
        for i in range(2)
    ]
    (tmp_path / "train.json").write_text(_json.dumps(manifest))
    colors = tmp_path / "colors.json"
    colors.write_text(_json.dumps(CLASS_TO_COLOR))

    calls = {"n": 0}

    def generator_fn(latents_in, seed):
        calls["n"] += 1
        # activations depend on the call count -> every reset changes them
        base = np.full((len(latents_in), 4, 4, 2), float(calls["n"]), np.float32)
        return {0: jnp.asarray(base)}

    dataset = DatasetGANGenerationDataset(
        json_path=tmp_path / "train.json",
        tensor_path=tmp_path / "tensors.npz",
        class_to_color_map_path=colors,
        image_size=8,
        generator_fn=generator_fn,
    )
    stream = dataset.sample_pixel_batches(batch_size=4, seed=0)
    first = next(stream)["activations"].copy()
    dataset.reset_dataset()
    second = next(stream)["activations"]
    assert not np.allclose(first, second), (
        "stream kept serving stale pre-reset activations"
    )
