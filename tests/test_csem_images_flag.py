"""`create_semantic_segmentation -i/--images`: real base images embedded
through an autoencoder checkpoint instead of sampled latents (reference
create_semantic_segmentation.py:170-172, :209-210)."""

import json

import jax
import jax.random
import numpy as np
import pytest
from PIL import Image

from synthesis_in_style_tpu.models.factory import get_autoencoder
from synthesis_in_style_tpu.utils.checkpoint import save_pytree

pytestmark = pytest.mark.slow  # excluded from the quick lane (-m 'not slow')



SIZE = 16
STYLE_DIM = 16


def _write_run(tmp_path, config):
    run_dir = tmp_path / "run"
    ckpt_dir = run_dir / "checkpoints" / "iter_00000001"
    (run_dir / "config").mkdir(parents=True)
    (run_dir / "config" / "config.json").write_text(json.dumps(config))
    return run_dir, ckpt_dir


def _write_images(tmp_path, n=4):
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    names = []
    for i in range(n):
        name = f"page_{i}.png"
        Image.fromarray(
            rng.randint(0, 255, (SIZE, SIZE, 3), dtype=np.uint8)
        ).save(img_dir / name)
        names.append(name)
    json_path = img_dir / "images.json"
    json_path.write_text(json.dumps(names))
    return json_path


def test_images_flag_clusters_real_images(tmp_path):
    from synthesis_in_style_tpu.cli import create_semantic_segmentation as css

    config = {
        "image_size": SIZE,
        "latent_size": STYLE_DIM,
        "n_mlp": 2,
        "stylegan_variant": 2,
        "batch_size": 2,
    }
    run_dir, ckpt_dir = _write_run(tmp_path, config)

    ae = get_autoencoder(config)
    variables = ae.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        np.zeros((1, SIZE, SIZE, 3), np.float32),
    )
    save_pytree(ckpt_dir, {"autoencoder": variables})

    json_path = _write_images(tmp_path)
    args = css.build_parser().parse_args(
        [
            str(ckpt_dir),
            "-i", str(json_path),
            "-b", "2",
            "-n", "4",
            "-c", "3", "4",
            "-s", "4",
        ]
    )
    css.main(args)

    sem_dir = run_dir / "semantic_segmentation"
    assert (sem_dir / "catalogs" / "3.npz").exists()
    assert (sem_dir / "cluster_arrays" / "3.npz").exists()
    assert (sem_dir / "cluster_images" / "3.png").exists()


def test_images_flag_rejects_generator_checkpoint(tmp_path):
    from synthesis_in_style_tpu.cli import create_semantic_segmentation as css
    from synthesis_in_style_tpu.models.stylegan2 import Generator

    config = {
        "image_size": SIZE,
        "latent_size": STYLE_DIM,
        "n_mlp": 2,
        "stylegan_variant": 2,
        "batch_size": 2,
    }
    run_dir, ckpt_dir = _write_run(tmp_path, config)

    gen = Generator(size=SIZE, style_dim=STYLE_DIM, n_mlp=2)
    variables = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        [np.zeros((1, STYLE_DIM), np.float32)],
    )
    save_pytree(
        ckpt_dir,
        {"g_ema": variables["params"], "g_noises": variables["noises"]},
    )

    json_path = _write_images(tmp_path)
    args = css.build_parser().parse_args(
        [str(ckpt_dir), "-i", str(json_path), "-b", "2", "-n", "2",
         "-c", "3", "4"]
    )
    with pytest.raises(ValueError, match="autoencoder checkpoint"):
        css.main(args)
