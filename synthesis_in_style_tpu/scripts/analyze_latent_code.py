"""Latent/noise statistics of an encoder over a dataset: histograms, CDFs,
and inverse-CDF "blueprints" for sampling new codes.

Capability parity with the reference
(/root/reference/stylegan_code_finder/scripts/analyze_latent_code.py,
486 LoC): embed a dataset through the autoencoder's encoder, cache
latents/noise to npz, then per-dimension histograms + empirical CDF plots
and a blueprint JSON (quantile grid per latent dim / noise map) that
downstream code can inverse-transform-sample from. `--stats` adds the
reference's visual statistics suite (parallel-coordinate plots,
Spearman-correlation heatmaps, Shapiro-Wilk normality maps — reference
plots_and_stats :236-289); `--check-reconstructed-cdf` overlays each
histogram with data re-sampled through the inverse CDF (reference
create_and_save_histogram(add_inverse_cdf_results=True) :71-79).

Usage:
  python -m synthesis_in_style_tpu.scripts.analyze_latent_code \
      <autoencoder_checkpoint> --dataset images.json [--save-dir out]
      [--stats] [--check-reconstructed-cdf]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def empirical_cdf(data: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(x, F(x)) of the empirical CDF (reference create_cdf :60-62)."""
    x = np.sort(data.reshape(-1))
    y = np.arange(1, len(x) + 1) / len(x)
    return x, y


def create_and_plot_cdf(data: np.ndarray, file_name: Path) -> None:
    x, y = empirical_cdf(data)
    fig, ax = plt.subplots()
    ax.plot(x, y)
    ax.set_ylabel("F(x)")
    fig.savefig(file_name)
    plt.close(fig)


def inverse_cdf_sample(data: np.ndarray, n: int,
                       rng: np.random.Generator) -> np.ndarray:
    """Sample n values by inverse-transform through the empirical quantile
    function of `data` (reference get_inverse_cdf :89-93)."""
    flat = np.sort(data.reshape(-1))
    u = rng.random(n)
    return np.interp(u, np.arange(1, len(flat) + 1) / len(flat), flat)


def create_and_save_histogram(data: np.ndarray, file_name: Path,
                              bins: int = 100,
                              check_reconstructed_cdf: bool = False) -> None:
    """With `check_reconstructed_cdf`, overlay a second histogram of data
    re-sampled through the inverse CDF — a visual self-check that the
    blueprint reproduces the distribution (reference
    create_and_save_histogram :71-79)."""
    fig, ax = plt.subplots()
    _, bin_edges, _ = ax.hist(data.reshape(-1), bins=bins)
    if check_reconstructed_cdf:
        resampled = inverse_cdf_sample(
            data, data.size, np.random.default_rng(0)
        )
        ax.hist(resampled, bins=bin_edges, alpha=0.6)
    fig.savefig(file_name)
    plt.close(fig)


def normalize_data(data: np.ndarray, axis=None,
                   eps: float = 1e-9) -> np.ndarray:
    """(reference normalize_data :107-110)."""
    lo = np.min(data, axis=axis, keepdims=axis is not None)
    hi = np.max(data, axis=axis, keepdims=axis is not None)
    return (data - lo) / (hi - lo + eps)


def parallel_coordinate_plot(data: np.ndarray, path: Path,
                             normalize: bool = False, **plot_kwargs) -> None:
    """One line per row of `data` across its columns (reference
    parallel_coordinate_plot :113-125)."""
    if normalize:
        data = normalize_data(data, axis=0)
    fig, ax = plt.subplots()
    plot_kwargs.setdefault("c", "k")
    plot_kwargs.setdefault("alpha", 0.1)
    plot_kwargs.setdefault("lw", 0.1)
    for row in data:
        ax.plot(row, **plot_kwargs)
    fig.savefig(path)
    plt.close(fig)


def save_array_as_image(data: np.ndarray, path: Path) -> None:
    """Matrix heatmap with colorbar (reference save_array_as_image
    :95-104)."""
    fig, ax = plt.subplots(figsize=(10, 8))
    im = ax.matshow(np.atleast_2d(data))
    fig.colorbar(im, ax=ax)
    fig.savefig(path, dpi=150)
    plt.close(fig)


def latent_stats_suite(latent_codes: np.ndarray, dest_dir: Path,
                       max_samples: int = 1000, max_dims: int = 128,
                       dims_per_plot: int = 16) -> None:
    """The reference's visual statistics battery over (N, slices, D) w+
    codes (plots_and_stats :236-289): parallel-coordinate plots per
    dim-window and per-dim-across-slices, Spearman correlation heatmap per
    slice, and Shapiro-Wilk normality p-value maps."""
    from scipy import stats

    if latent_codes.ndim == 2:  # w-only: one slice
        latent_codes = latent_codes[:, None, :]
    data = latent_codes[:max_samples]
    n, slices, dim = data.shape
    max_dims = min(max_dims, dim)
    plot_dir = dest_dir / "visualizations"
    results_dir = dest_dir / "test_results"
    plot_dir.mkdir(parents=True, exist_ok=True)
    results_dir.mkdir(parents=True, exist_ok=True)

    normalized = normalize_data(data, axis=0)
    for k in range(0, max_dims, dims_per_plot):
        for i in range(slices):
            parallel_coordinate_plot(
                normalized[:, i, k : k + dims_per_plot],
                plot_dir / f"plot_a_{k}-{k + dims_per_plot}_{i}.png",
            )
    if slices > 1:
        for j in range(max_dims):
            parallel_coordinate_plot(
                normalized[:, :, j], plot_dir / f"plot_b_{j}.png"
            )

    for i in range(slices):
        corr, _ = stats.spearmanr(data[:, i, :])
        save_array_as_image(
            np.atleast_2d(corr), results_dir / f"correlation_c_{i}.png"
        )

    shapiro_n = min(n, 500)  # shapiro is O(n^2)-ish and warns above 5000
    results_all = np.zeros((slices, 1))
    results_per_code = np.zeros((slices, dim))
    results_per_sample = np.zeros((slices, shapiro_n))
    for i in range(slices):
        results_all[i, 0] = stats.shapiro(data[:shapiro_n, i, :].ravel()).pvalue
        for j in range(dim):
            results_per_code[i, j] = stats.shapiro(data[:shapiro_n, i, j]).pvalue
        for j in range(shapiro_n):
            results_per_sample[i, j] = stats.shapiro(data[j, i, :]).pvalue
    save_array_as_image(results_all, results_dir / "shapiro_wilk_sliced.png")
    save_array_as_image(
        results_per_code, results_dir / "shapiro_wilk_per_code.png"
    )
    save_array_as_image(
        results_per_sample, results_dir / "shapiro_wilk_per_sample.png"
    )


def inverse_cdf_blueprint(data: np.ndarray, num_quantiles: int = 256) -> Dict:
    """Quantile grid usable for inverse-transform sampling (reference
    create_inverse_transform_building_blocks + get_inverse_cdf :82-93)."""
    flat = np.sort(data.reshape(-1))
    qs = np.linspace(0.0, 1.0, num_quantiles)
    values = np.quantile(flat, qs)
    return {"quantiles": qs.tolist(), "values": values.tolist(),
            "mean": float(flat.mean()), "std": float(flat.std())}


def analyze_latents(latent_codes: np.ndarray, dest_dir: Path,
                    max_dims_plotted: int = 16, stats: bool = False,
                    check_reconstructed_cdf: bool = False) -> Dict:
    """Per-dimension histograms + global CDF + blueprint (reference
    LatentCodeAnalyzer :144-289)."""
    dest_dir.mkdir(parents=True, exist_ok=True)
    flat = latent_codes.reshape(-1, latent_codes.shape[-1])
    create_and_save_histogram(flat, dest_dir / "latent_histogram.png",
                              check_reconstructed_cdf=check_reconstructed_cdf)
    create_and_plot_cdf(flat, dest_dir / "latent_cdf.png")
    for dim in range(min(max_dims_plotted, flat.shape[-1])):
        create_and_save_histogram(
            flat[:, dim], dest_dir / f"latent_dim_{dim:03d}.png",
            check_reconstructed_cdf=check_reconstructed_cdf,
        )
    if stats:
        latent_stats_suite(latent_codes, dest_dir)
    blueprint = {
        "shape": list(latent_codes.shape[1:]),
        "global": inverse_cdf_blueprint(flat),
        "per_dim_mean": flat.mean(axis=0).tolist(),
        "per_dim_std": flat.std(axis=0).tolist(),
    }
    with (dest_dir / "latent_blueprint.json").open("w") as f:
        json.dump(blueprint, f)
    return blueprint


def analyze_noise(noises: List[np.ndarray], dest_dir: Path) -> Dict:
    """(reference NoiseAnalyzer :292-393, condensed)."""
    dest_dir.mkdir(parents=True, exist_ok=True)
    blueprint = {}
    for i, noise in enumerate(noises):
        key = f"noise_{noise.shape[1]}x{noise.shape[2]}_{i}"
        create_and_save_histogram(noise, dest_dir / f"{key}_histogram.png")
        blueprint[key] = {
            "shape": list(noise.shape[1:]),
            **inverse_cdf_blueprint(noise),
        }
    with (dest_dir / "noise_blueprint.json").open("w") as f:
        json.dump(blueprint, f)
    return blueprint


def embed_images(args, config: dict) -> Tuple[np.ndarray, List[np.ndarray]]:
    """Encode the dataset to latents + noise (reference embed_images :24-57),
    cached to npz."""
    cache = Path(args.save_dir) / "embedded.npz"
    if cache.exists() and not args.force:
        data = np.load(cache)
        return (
            data["latents"],
            [data[f"noise_{i}"] for i in range(int(data["num_noise_layers"]))],
        )

    from synthesis_in_style_tpu.cli.train_stylegan_2 import GANImageDataset
    from synthesis_in_style_tpu.data import DataLoader
    from synthesis_in_style_tpu.models.factory import get_autoencoder
    from synthesis_in_style_tpu.utils.checkpoint import load_pytree

    dataset_json = Path(args.dataset)
    dataset = GANImageDataset(
        dataset_json, root=dataset_json.parent,
        image_size=config["image_size"],
        num_channels=config.get("input_dim", 3),
    )
    loader = DataLoader(dataset, args.batch_size, shuffle=False,
                        drop_last=False, num_workers=2)

    # the factory handles stylegan_variant / latent_size defaults exactly
    # like the snapshot's own training run did
    ae = get_autoencoder(config)
    tree = load_pytree(Path(args.autoencoder_checkpoint))
    variables = jax.tree_util.tree_map(jnp.asarray, tree["autoencoder"])

    @jax.jit
    def encode(x):
        return ae.apply(variables, x, train=False,
                        method="encode")

    all_latents = []
    all_noises = None
    for batch in loader:
        latents = encode(jnp.asarray(batch["images"]))
        all_latents.append(np.asarray(latents.latent))
        noises = [np.asarray(n) for n in latents.noise]
        if all_noises is None:
            all_noises = [[n] for n in noises]
        else:
            for acc, n in zip(all_noises, noises):
                acc.append(n)
    latents = np.concatenate(all_latents, axis=0)
    noises = [np.concatenate(acc, axis=0) for acc in all_noises]

    cache.parent.mkdir(parents=True, exist_ok=True)
    # per-layer keys — the noise maps have different spatial shapes, so one
    # object array cannot hold them (np.asarray raises)
    np.savez(
        cache, latents=latents, num_noise_layers=len(noises),
        **{f"noise_{i}": n for i, n in enumerate(noises)},
    )
    return latents, noises


def main(args: argparse.Namespace) -> None:
    from synthesis_in_style_tpu.core.config import load_config_from_checkpoint

    config = load_config_from_checkpoint(
        args.autoencoder_checkpoint, args.original_config_path
    )
    save_dir = Path(args.save_dir)
    latents, noises = embed_images(args, config)
    analyze_latents(
        latents, save_dir / "latents", stats=args.stats,
        check_reconstructed_cdf=args.check_reconstructed_cdf,
    )
    analyze_noise(noises, save_dir / "noise")
    print(f"analysis written to {save_dir}")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Analyze the latent codes an encoder produces over a "
        "dataset"
    )
    parser.add_argument("autoencoder_checkpoint")
    parser.add_argument("--dataset", required=True,
                        help="json manifest of images to embed")
    parser.add_argument("--save-dir", default="latent_code_analysis")
    parser.add_argument("-op", "--original-config-path", type=Path, default=None)
    parser.add_argument("-f", "--force", action="store_true", default=False)
    parser.add_argument("-b", "--batch-size", type=int, default=8)
    parser.add_argument("--stats", action="store_true", default=False,
                        help="parallel-coordinate plots, Spearman "
                        "correlation and Shapiro-Wilk normality maps "
                        "(reference plots_and_stats)")
    parser.add_argument("--check-reconstructed-cdf", action="store_true",
                        default=False,
                        help="overlay histograms with inverse-CDF "
                        "re-sampled data (blueprint self-check)")
    return parser


if __name__ == "__main__":
    main(build_parser().parse_args())
