"""Generator-quality TREND gate: relative FID across training checkpoints
with one FIXED embedding (VERDICT r3 #5).

FID in this environment runs on a pinned-seed embedding when no converted
InceptionV3 weights are available (evaluation/fid.py default_feature_fn —
loud warning, numbers are relative distances, not calibrated FID). Relative
trends don't need calibration: with the SAME embedding, the same real
statistics, and the SAME latent stream, FID(trained late) < FID(trained
early) < FID(random init) is a quantitative, reproducible generator-quality
gate — replacing the round-3 "samples visibly reproduce both text types"
eyeball (reference quality loop: extensions/fid_score.py:16-39 runs FIDScore
every epoch).

    python -m synthesis_in_style_tpu.scripts.fid_trend \
        <run_checkpoints_dir> --images <pages_dir_or_json> \
        [--num-samples 256] [--batch 16] [--json out.json]

Writes {"checkpoints": {"init": F, "iter_...": F, ...}} — gate the committed
artifact with tests/test_fid_trend.py.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("checkpoints_dir",
                        help="a run's checkpoints/ dir holding iter_* "
                        "snapshots")
    parser.add_argument("--images", required=True,
                        help="real page dir (PNGs) or files.json")
    parser.add_argument("--num-samples", type=int, default=256)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--json", default=None)
    parser.add_argument("--skip-init", action="store_true")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from synthesis_in_style_tpu.core.config import load_config_from_checkpoint
    from synthesis_in_style_tpu.evaluation.fid import GenerativeFID
    from synthesis_in_style_tpu.models.factory import load_generator
    from synthesis_in_style_tpu.utils.checkpoint import latest_snapshot

    ckpt_dir = Path(args.checkpoints_dir)
    snapshots = sorted(ckpt_dir.glob("iter_*"))
    assert snapshots, f"no iter_* snapshots under {ckpt_dir}"
    config = load_config_from_checkpoint(snapshots[-1], None)
    size = config["image_size"]

    image_dir = Path(args.images)
    if image_dir.suffix == ".json":
        entries = json.loads(image_dir.read_text())
        paths = [
            image_dir.parent / (e["file_name"] if isinstance(e, dict) else e)
            for e in entries
        ]
    else:
        paths = sorted(image_dir.glob("*.png"))
    paths = paths[: args.num_samples]

    class RealLoader:
        """Duck-typed loader for FID.calculate_statistics_for_real_images
        (needs .infinite() yielding {'images': batch})."""

        def infinite(self):
            while True:
                for i in range(0, len(paths), args.batch):
                    chunk = paths[i : i + args.batch]
                    imgs = [
                        np.asarray(
                            Image.open(p).convert("RGB").resize((size, size))
                        ).astype(np.float32) / 127.5 - 1.0
                        for p in chunk
                    ]
                    yield {"images": np.stack(imgs)}

    real_loader = RealLoader

    # ONE embedding instance for every checkpoint — the trend is only
    # meaningful against fixed features + fixed real statistics
    fid = GenerativeFID(
        num_samples=args.num_samples,
        latent_size=config.get("latent_size", 512),
        batch_size=args.batch,
        seed=42,
        batch_image_key="images",
    )

    results = {}

    def evaluate(tag: str, gen, variables):
        @jax.jit
        def model_fn(z):
            img, _ = gen.apply(variables, [z], randomize_noise=False)
            return jnp.clip(img, -1.0, 1.0)

        score = fid(model_fn, real_loader())
        results[tag] = float(score)
        print(f"{tag}: relative FID {score:.3f}", flush=True)

    # random-init baseline: same architecture, pinned init seed
    if not args.skip_init:
        from synthesis_in_style_tpu.models.factory import get_generator

        gen = get_generator(config)
        variables = gen.init(
            {"params": jax.random.PRNGKey(0),
             "noise": jax.random.PRNGKey(1)},
            [jnp.zeros((1, config.get("latent_size", 512)))],
        )
        evaluate("init", gen, variables)

    for snap in snapshots:
        gen, variables = load_generator(snap, config)
        evaluate(snap.name, gen, variables)

    out = {
        "image_size": size,
        "num_samples": args.num_samples,
        "embedding": "pinned-seed pooled VGG (relative, uncalibrated)",
        "checkpoints": results,
    }
    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=2))
        print("wrote", args.json, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
