"""FID machinery, PSNR/SSIM, the analyze_image_segments sweep CLI, and the
results post-processing CLIs (reference evaluation/*, segmentation/evaluation/*)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from synthesis_in_style_tpu.evaluation.fid import (
    FIDStatistics,
    GenerativeFID,
    calculate_frechet_distance,
    default_feature_fn,
    get_statistics,
)
from synthesis_in_style_tpu.evaluation.psnr_ssim import PSNRSSIMEvaluator, psnr, ssim


# ---------------- FID -------------------------------------------------------

def test_frechet_distance_identical_is_zero():
    rng = np.random.default_rng(0)
    acts = rng.normal(size=(200, 8))
    stats = get_statistics(acts)
    assert calculate_frechet_distance(
        stats.mu, stats.sigma, stats.mu, stats.sigma
    ) == pytest.approx(0.0, abs=1e-6)


def test_frechet_distance_mean_shift():
    # two unit gaussians shifted by d: FID = d^2
    dim = 4
    mu1 = np.zeros(dim)
    mu2 = np.full(dim, 2.0)
    sigma = np.eye(dim)
    assert calculate_frechet_distance(mu1, sigma, mu2, sigma) == pytest.approx(
        dim * 4.0, rel=1e-5
    )


def test_fid_caching_and_generative(tmp_path):
    class FakeLoader:
        batch_size = 4

        def infinite(self):
            rng = np.random.default_rng(0)
            while True:
                yield {
                    "images": rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
                }

    fid = GenerativeFID(
        default_feature_fn(), latent_size=8, batch_size=4, num_samples=16,
        batch_image_key="images",
    )

    def model_fn(z):
        # a fake generator: broadcast z into an image
        return jnp.tanh(
            jnp.broadcast_to(z[:, None, None, :8], (z.shape[0], 32, 32, 8))[
                ..., :3
            ]
        )

    score = fid(model_fn, FakeLoader(), dataset_path=tmp_path / "val.json")
    assert np.isfinite(score) and score > 0
    # real statistics were cached
    caches = list(tmp_path.glob("fid_stats_*.npz"))
    assert len(caches) == 1
    stats = FIDStatistics(**{k: np.load(caches[0])[k] for k in ("mu", "sigma")})
    assert stats.mu.ndim == 1


# ---------------- PSNR / SSIM ----------------------------------------------

def test_psnr_known_value():
    x = jnp.zeros((1, 8, 8, 3))
    y = jnp.full((1, 8, 8, 3), 0.5)
    # mse = 0.25 -> psnr = 10*log10(1/0.25) ~ 6.0206
    assert float(psnr(x, y)) == pytest.approx(6.0206, abs=1e-3)


def test_ssim_identity_and_degradation():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)
    noisy = jnp.clip(x + 0.3 * rng.normal(size=x.shape).astype(np.float32), 0, 1)
    assert float(ssim(x, noisy)) < 0.9


def test_psnr_ssim_evaluator_normalizes():
    evaluator = PSNRSSIMEvaluator()
    x = jnp.zeros((1, 16, 16, 3)) - 1.0  # [-1, 1] range input
    y = jnp.ones((1, 16, 16, 3))
    p, s = evaluator.psnr_and_ssim(x, y)
    assert float(p) == pytest.approx(0.0, abs=1e-3)  # max error -> 0 dB
    assert float(s) < 0.1


# ---------------- sweep CLI end-to-end --------------------------------------

@pytest.mark.slow  # >20s on the 1-core host; full lane only
def test_analyze_image_segments_cli(tmp_path):
    import yaml

    from synthesis_in_style_tpu.cli import analyze_image_segments as ais
    from synthesis_in_style_tpu.cli import train as train_cli
    from synthesis_in_style_tpu.utils.checkpoint import latest_snapshot

    class_to_color = {
        "background": "#000000",
        "printed_text": "#0000FF",
        "handwritten_text": "#FF0000",
    }
    colors_path = tmp_path / "colors.json"
    colors_path.write_text(json.dumps(class_to_color))

    # train a tiny DocUFCN
    rng = np.random.default_rng(0)
    files = []
    for i in range(2):
        img = rng.integers(0, 255, (32, 32, 3), np.uint8)
        mask = np.zeros((32, 32, 3), np.uint8)
        mask[8:24, 8:24] = (0, 0, 255)
        Image.fromarray(np.concatenate([img, mask], axis=1)).save(
            tmp_path / f"im_{i}.png"
        )
        files.append({"file_name": f"im_{i}.png"})
    (tmp_path / "train.json").write_text(json.dumps(files))
    config = {
        "network": "DocUFCN", "dataset": "wpi", "num_classes": 3,
        "image_size": 32, "batch_size": 2, "num_augmentations": 1,
        "num_workers": 1, "lr": 1e-3, "beta1": 0.9, "beta2": 0.999,
        "weight_decay": 0.0, "end_lr": 1e-5, "max_iter": 2,
        "snapshot_save_iter": 2, "image_save_iter": 100, "log_iter": 1,
        "display_size": 2, "class_weights": [1.0, 1.0, 1.0], "epochs": 1,
    }
    config_path = tmp_path / "config.yaml"
    config_path.write_text(yaml.dump(config))
    log_dir = tmp_path / "logs"
    targs = train_cli.build_parser().parse_args(
        [str(config_path), "--images", str(tmp_path / "train.json"),
         "--class-to-color-map", str(colors_path), "--debug"]
    )
    targs.log_dir = str(log_dir)
    train_cli.main(targs)
    snapshot = latest_snapshot(log_dir / "checkpoints")

    # evaluation inputs: pages + _gt masks
    pages = tmp_path / "pages"
    gts = tmp_path / "gt"
    pages.mkdir()
    gts.mkdir()
    for i in range(2):
        Image.fromarray(
            rng.integers(0, 255, (40, 48, 3), np.uint8)
        ).save(pages / f"page_{i}.png")
        gt = np.zeros((40, 48, 3), np.uint8)
        gt[10:30, 10:30] = (0, 0, 255)
        Image.fromarray(gt).save(gts / f"page_{i}_gt.png")

    eval_config = {
        "checkpoint": str(snapshot),
        "class_to_color_map": str(colors_path),
    }
    eval_config_path = tmp_path / "eval_config.json"
    eval_config_path.write_text(json.dumps(eval_config))

    out_dir = tmp_path / "out"
    args = ais.build_parser().parse_args(
        [str(pages), "-f", str(eval_config_path), "-gt", str(gts),
         "-cds", "-cio", "-vis", "-o", str(out_dir),
         "--min-confidence", "0.3", "0.7",
         "-op", str(config_path), "--overlay-segmentation"]
    )
    ais.main(args)

    results = json.loads((out_dir / "results.json").read_text())
    assert len(results["runs"]) == 2  # two min_confidence values
    run = results["runs"][0]
    assert "average_dice_scores" in run and "average_iou_scores" in run
    assert set(run["confusion_matrices"].keys()) == {"page_0", "page_1"}
    assert run["hyperparams"]["min_confidence"] == 0.3
    assert list(out_dir.glob("*_segmentation.png"))
    assert list(out_dir.glob("*_overlay.png"))

    # ---- downstream result CLIs on the produced results.json ----
    from synthesis_in_style_tpu.cli import evaluate_metrics as em

    em_args = em.build_parser().parse_args(
        [str(out_dir / "results.json"), "-p", "-c"]
    )
    em.main(em_args)  # prints tables; must not raise

    from synthesis_in_style_tpu.cli import extract_results_subset as ers

    subset_file = tmp_path / "subset.txt"
    subset_file.write_text("page_0.png\n")
    ers_args = ers.build_parser().parse_args(
        [str(out_dir / "results.json"), str(subset_file),
         "-o", str(tmp_path / "subset_results.json")]
    )
    ers.main(ers_args)
    subset_results = json.loads((tmp_path / "subset_results.json").read_text())
    assert set(subset_results["runs"][0]["confusion_matrices"]) == {"page_0"}

    from synthesis_in_style_tpu.cli import plot_metrics as pm

    pm_args = pm.build_parser().parse_args(
        [str(out_dir / "results.json"), str(tmp_path / "figs")]
    )
    pm.main(pm_args)
    assert list((tmp_path / "figs").glob("*.png"))


def test_analyze_image_segments_cli_batched_pages(tmp_path):
    """--pages-per-batch N (batched fused dispatch, device-argmax uint8
    output) produces the same results.json metrics as the per-page fused
    path."""
    import jax
    import jax.numpy as jnp

    from synthesis_in_style_tpu.cli import analyze_image_segments as ais
    from synthesis_in_style_tpu.models.doc_ufcn import DocUFCN
    from synthesis_in_style_tpu.utils.checkpoint import save_pytree

    class_to_color = {
        "background": "#000000",
        "printed_text": "#0000FF",
        "handwritten_text": "#FF0000",
    }
    colors_path = tmp_path / "colors.json"
    colors_path.write_text(json.dumps(class_to_color))

    run_dir = tmp_path / "run"
    ckpt = run_dir / "checkpoints" / "iter_00000001"
    (run_dir / "config").mkdir(parents=True)
    (run_dir / "config" / "config.json").write_text(json.dumps({
        "network": "DocUFCN", "num_classes": 3, "input_dim": 3,
        "image_size": 32, "batch_size": 2,
        "class_to_color_map": str(colors_path),
    }))
    model = DocUFCN(num_classes=3)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, 32, 32, 3)), train=False,
    )
    save_pytree(ckpt, {"segmentation_network": variables})

    rng = np.random.default_rng(7)
    pages = tmp_path / "pages"
    gts = tmp_path / "gt"
    pages.mkdir()
    gts.mkdir()
    # 3 pages of one size + 2 of another: exercises grouping AND the padded
    # short chunk (3 % 2 != 0)
    for i, (h, w) in enumerate([(40, 48)] * 3 + [(36, 36)] * 2):
        Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8)).save(
            pages / f"page_{i}.png"
        )
        gt = np.zeros((h, w, 3), np.uint8)
        gt[10:30, 10:30] = (0, 0, 255)
        Image.fromarray(gt).save(gts / f"page_{i}_gt.png")

    eval_config = {
        "checkpoint": str(ckpt),
        "class_to_color_map": str(colors_path),
    }
    eval_config_path = tmp_path / "eval_config.json"
    eval_config_path.write_text(json.dumps(eval_config))

    outs = []
    for name, extra in [
        ("per_page", []),
        ("batched", ["--pages-per-batch", "2"]),
    ]:
        out_dir = tmp_path / name
        args = ais.build_parser().parse_args(
            [str(pages), "-f", str(eval_config_path), "-gt", str(gts),
             "-cds", "-cio", "-o", str(out_dir),
             "--min-confidence", "0.3", "0.7",
             "--fused-page-inference", *extra]
        )
        ais.main(args)
        outs.append(json.loads((out_dir / "results.json").read_text()))

    per_page, batched = outs
    assert len(batched["runs"]) == 2
    for run_a, run_b in zip(per_page["runs"], batched["runs"]):
        assert run_a["hyperparams"] == run_b["hyperparams"]
        assert run_a["confusion_matrices"] == run_b["confusion_matrices"]
        assert run_a["average_dice_scores"] == run_b["average_dice_scores"]
        assert run_a["average_iou_scores"] == run_b["average_iou_scores"]
