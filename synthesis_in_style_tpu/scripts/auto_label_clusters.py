"""Heuristic cluster auto-labelling — a scriptable stand-in for the human
semantic-labeller step (labeller/app.py), used by the trained-quality
capstone (MEASUREMENTS.md).

For each (layer, cluster) of the fitted catalogs it samples N images through
the trained generator, assigns clusters, and labels by luminance plus a
class statistic: clusters whose pixels are mostly dark become text, split
into `left_class` / `right_class` by `--mode`:

* ``appearance`` (default): by stroke appearance — the printed-like share
  of the cluster's ink under a horizontal-minus-vertical-run box filter
  (straight printed strokes ~0.98, curvy handwriting ~0.09), the same
  signal a human uses in the labeller UI.
* ``side``: the legacy round-3/4 layout prior (printed LEFT, handwriting
  RIGHT) for position-coded fixtures.

    python -m synthesis_in_style_tpu.scripts.auto_label_clusters \
        <checkpoint> <semantic_segmentation_dir> -k 12 [-n 32]
        [--dark-threshold 0.55] [--dark-fraction 0.4] [--left-threshold 0.6]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("checkpoint")
    parser.add_argument("sem_dir")
    parser.add_argument("-k", "--num-clusters", type=int, required=True)
    parser.add_argument("-n", "--num-samples", type=int, default=32)
    parser.add_argument("-b", "--batch-size", type=int, default=8)
    parser.add_argument("--dark-threshold", type=float, default=0.55,
                        help="luminance (in [0,1]) below which a pixel "
                        "counts as ink")
    parser.add_argument("--dark-fraction", type=float, default=0.4,
                        help="min fraction of a cluster's pixels that must "
                        "be dark for it to be a text cluster")
    parser.add_argument("--left-threshold", type=float, default=0.6,
                        help="dark pixels left-half fraction above which a "
                        "text cluster is `left_class`")
    parser.add_argument("--mode", choices=("appearance", "side"),
                        default="appearance",
                        help="class split: stroke appearance (default) or "
                        "the legacy left/right position prior")
    parser.add_argument("--run-len-frac", type=float, default=0.07)
    parser.add_argument("--printed-margin", type=float, default=0.35)
    parser.add_argument("--printed-frac-threshold", type=float, default=0.55)
    parser.add_argument("--left-class", default="printed_text")
    parser.add_argument("--right-class", default="handwritten_text")
    parser.add_argument("--background-class", default="background")
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from synthesis_in_style_tpu.core.config import (
        load_config_from_checkpoint,
    )
    from synthesis_in_style_tpu.models.factory import load_generator
    from synthesis_in_style_tpu.segmentation.factor_catalog import (
        load_catalogs,
    )
    from synthesis_in_style_tpu.utils.dataset_creation import (
        build_latent_and_noise_generator,
    )

    sem_dir = Path(args.sem_dir)
    k = args.num_clusters
    config = load_config_from_checkpoint(Path(args.checkpoint), None)
    config["batch_size"] = args.batch_size
    gen, variables = load_generator(Path(args.checkpoint), config)
    catalogs = load_catalogs(sem_dir / "catalogs" / f"{k}.npz")

    @jax.jit
    def generate(z):
        return gen.apply(
            variables, [z], randomize_noise=False,
            return_intermediate_activations=True,
        )

    stream = build_latent_and_noise_generator(config, seed=7)
    size = config["image_size"]
    xfrac = np.broadcast_to((np.arange(size) + 0.5) / size, (size, size))
    run_len = max(5, int(round(size * args.run_len_frac)) | 1)
    # per (layer, cluster): [sum_lum, class_feature_count, n_dark, n_total]
    # where class_feature_count is dark&left (side) or dark&printed_like
    # (appearance)
    stats = {layer: np.zeros((k, 4), np.float64) for layer in catalogs}

    done = 0
    while done < args.num_samples:
        latents = next(stream)
        z = jnp.asarray(
            latents.latent if hasattr(latents, "latent") else latents
        )
        img, acts = generate(z)
        img = np.asarray(jnp.clip((img + 1) / 2, 0, 1))
        lum = img.mean(axis=-1)
        if args.mode == "appearance":
            import cv2

            dark_f = (lum < args.dark_threshold).astype(np.float32)
            class_feat = np.empty_like(dark_f, dtype=bool)
            for b in range(dark_f.shape[0]):
                kh = np.ones((1, run_len), np.float32) / run_len
                hrun = cv2.filter2D(dark_f[b], -1, kh,
                                    borderType=cv2.BORDER_CONSTANT)
                vrun = cv2.filter2D(dark_f[b], -1, kh.T,
                                    borderType=cv2.BORDER_CONSTANT)
                class_feat[b] = (hrun - vrun) > args.printed_margin
        else:
            class_feat = np.broadcast_to(xfrac, lum.shape) < 0.5
        for layer, cat in catalogs.items():
            a = acts[int(layer)]
            h, w = a.shape[1:3]
            ids = np.asarray(cat.predict(np.asarray(a)))
            yi = (np.arange(size) * h // size).clip(0, h - 1)
            xi = (np.arange(size) * w // size).clip(0, w - 1)
            ids_big = ids[:, yi][:, :, xi]
            for cl in range(k):
                m = ids_big == cl
                n = m.sum()
                if n == 0:
                    continue
                s = stats[layer][cl]
                dark = m & (lum < args.dark_threshold)
                s[0] += lum[m].sum()
                s[1] += (dark & class_feat).sum()
                s[2] += dark.sum()
                s[3] += n
        done += img.shape[0]

    class_threshold = (
        args.printed_frac_threshold
        if args.mode == "appearance" else args.left_threshold
    )
    feat_name = "printed" if args.mode == "appearance" else "dark_left"
    label_map = {}
    for layer, s in stats.items():
        label_map[layer] = {}
        for cl in range(k):
            n = s[cl, 3]
            dark_frac = s[cl, 2] / n if n else 0.0
            class_frac = s[cl, 1] / max(1.0, s[cl, 2])
            if dark_frac > args.dark_fraction:
                name = (
                    args.left_class
                    if class_frac >= class_threshold
                    else args.right_class
                )
            else:
                name = args.background_class
            label_map[layer][str(cl)] = name
            print(
                f"layer {layer} cluster {cl}: dark={dark_frac:.2f} "
                f"{feat_name}={class_frac:.2f} -> {name}"
            )

    out = sem_dir / f"merged_classes_{k}.json"
    out.write_text(json.dumps(label_map))
    print("wrote", out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
