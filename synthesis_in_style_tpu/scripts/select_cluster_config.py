"""Purity-scored cluster-config selection: sweep the fitted k grid, score
every (layer, k) for class separability and ink coverage, and emit the
layer-role creation config the reference chooses BY HAND.

The reference pipeline's quality hinges on two human choices encoded in its
dataset-creation configs (reference
configs/dataset_creation/stylegan2_cluster_based_bw_hwp_wpi.json:7-13):
which layers determine the text CLASS (`keys_for_class_determination`),
which layers carve the ink strokes (`keys_for_finegrained_segmentation`),
and which k the labelled catalog uses — picked by a human inspecting the
k=3..24 sweep of create_semantic_segmentation (reference
create_semantic_segmentation.py:181-187) in the labeller UI. This script
replaces that inspection with measured per-cluster statistics. The default
`--class-mode appearance` classifies text clusters by STROKE APPEARANCE —
the printed-like share of their ink under a horizontal-minus-vertical-run
box filter (straight ruled/printed strokes score ~0.98, curvy handwriting
~0.09 on the fixture) — the same signal a human uses in the labeller UI,
and one that transfers to any collection where classes differ by
appearance. `--class-mode side` keeps the legacy round-3/4 layout prior
(printed LEFT, handwriting RIGHT) for position-coded fixtures:

* class-determination score of (layer, k): ink-weighted class purity
  `2*|class_frac - 0.5|` over text clusters (class_frac = printed-like ink
  share in appearance mode, dark-left share in side mode), gated on BOTH a
  printed and a handwritten text cluster existing — a layer/k that mixes
  stroke types scores low, exactly the round-3 failure mode (handwritten
  dice 0.002 from dark-left fractions 0.4-0.6 at a blanket k=12).
* fine-grained score: ink F-beta (beta=2 by default, recall-weighted) —
  how much of the page's dark mass the text clusters capture at how little
  paper contamination. Recall dominates deliberately: a fine layer that
  labels only SOME visually-identical strokes (high precision, low recall)
  gives contradictory supervision and the downstream segmenter collapses to
  background — measured in round 4 (text dice 0.02 with P=0.76/R=0.72
  labels vs 0.24 with blobby P=0.5/R=0.9 labels; MEASUREMENTS.md).

All statistics run ON DEVICE: cluster assignment is the bucketed matmul
(`assign_euclidean_bucketed`), per-cluster sums are one one-hot matmul per
(layer, k), and only a (k, 5) table is fetched per pair, so the whole sweep
is a few seconds of TPU time per k.

Output: a composed per-layer-best-k catalog `catalogs/<tag>.npz` +
`merged_classes_<tag>.json` (side-labelled) + `creation_config_<tag>.json`
consumable by cli.create_dataset_for_segmentation with
`--num-clusters <tag>`.

    python -m synthesis_in_style_tpu.scripts.select_cluster_config \
        <checkpoint> <semantic_segmentation_dir> --ks 3 4 6 8 10 12 14 16 \
        [-n 64] [--out-tag sel] [--num-cd-layers 2] [--num-fg-layers 2]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("checkpoint")
    parser.add_argument("sem_dir")
    parser.add_argument("--ks", nargs="+", type=int, required=True,
                        help="cluster counts to score (catalogs/<k>.npz "
                        "must exist for each)")
    parser.add_argument("-n", "--num-samples", type=int, default=64)
    parser.add_argument("-b", "--batch-size", type=int, default=8)
    parser.add_argument("--dark-threshold", type=float, default=0.55)
    parser.add_argument("--dark-fraction", type=float, default=0.4,
                        help="min dark fraction for an INK (fine-grained) "
                        "text cluster")
    parser.add_argument("--cd-dark-fraction", type=float, default=0.15,
                        help="min dark fraction for a REGION "
                        "(class-determination) text cluster — coarse-layer "
                        "clusters over sparse handwriting mix strokes with "
                        "paper, so region semantics need a lower bar than "
                        "ink semantics (the fixture's squiggle areas are "
                        "~0.2-0.35 dark while printed line blocks are "
                        ">0.4; a single threshold silently drops the "
                        "handwritten REGIONS and the rendered dataset "
                        "starves that class)")
    parser.add_argument("--left-threshold", type=float, default=0.6)
    parser.add_argument("--class-mode", choices=("appearance", "side"),
                        default="appearance",
                        help="how text clusters are split into the two "
                        "classes: 'appearance' (default) classifies by "
                        "stroke appearance — the horizontal-run-minus-"
                        "vertical-run box filter that separates straight "
                        "ruled/printed strokes from curvy handwriting, the "
                        "same signal a human uses in the reference's "
                        "labeller UI; 'side' is the legacy round-3/4 "
                        "position prior (printed LEFT / handwriting RIGHT) "
                        "that only works on layout-coded fixtures")
    parser.add_argument("--run-len-frac", type=float, default=0.07,
                        help="appearance mode: box-filter window as a "
                        "fraction of image size (0.07 -> 9px at 128)")
    parser.add_argument("--printed-margin", type=float, default=0.35,
                        help="appearance mode: a dark pixel is printed-like "
                        "when horiz_run - vert_run exceeds this (measured "
                        "on the fixture: printed ink 0.98, handwriting "
                        "0.09 at window 9/128px)")
    parser.add_argument("--printed-frac-threshold", type=float, default=0.55,
                        help="appearance mode: text cluster is printed when "
                        "its printed-like share of ink >= this, else "
                        "handwritten")
    parser.add_argument("--left-class", default="printed_text")
    parser.add_argument("--right-class", default="handwritten_text")
    parser.add_argument("--background-class", default="background")
    parser.add_argument("--num-cd-layers", type=int, default=2)
    parser.add_argument("--num-fg-layers", type=int, default=3)
    parser.add_argument("--fg-beta", type=float, default=2.0,
                        help="F-beta weight for the fine-grained ink score "
                        "(recall-weighted by default; see module docstring)")
    parser.add_argument("--min-cd-resolution", type=int, default=16,
                        help="class-determination candidates need at least "
                        "this feature-map resolution")
    parser.add_argument("--min-fg-resolution-frac", type=float, default=0.5,
                        help="fine-grained candidates need resolution >= "
                        "frac * image_size")
    parser.add_argument("--out-tag", default="sel")
    parser.add_argument("--min-class-contour-area", type=int, default=4)
    parser.add_argument("--fine-mask-dilation", type=int, default=2,
                        help="px halo around fine ink masks in the rendered "
                        "labels (round-4 lesson 5: stroke-exact labels are "
                        "unlearnable; a 2px halo restored learnability)")
    parser.add_argument("--seed", type=int, default=7)
    return parser


def score_stats(
    stats: np.ndarray,  # (k, 5|6): [n, n_dark, n_dark_left, lum_sum,
    #                                n_left, (n_dark_printed_like)]
    dark_fraction: float,
    left_threshold: float,
    fg_beta: float = 2.0,
    region: bool = False,
    mode: str = "side",
) -> dict:
    """Host-side scoring of one (layer, k) stats table (module docstring).

    `mode="appearance"`: the class coordinate is the printed-like share of
    the cluster's INK (column 5 / column 1) for BOTH region and ink
    semantics — a region's ground-truth class is determined by the
    appearance of the strokes inside it, so the side-mode area-vs-ink split
    collapses; `region=True` then only selects the caller's laxer
    dark-fraction threshold. This is the honest stand-in for the human
    appearance judgment in the reference's labeller UI.

    `mode="side"` + `region=True` (legacy position prior): a text cluster's
    side is judged by its AREA (n_left/n), not by where its ink sits — the
    rendered pipeline paints the cluster's full extent into the class
    region, so an ink-side-pure cluster whose area straddles the page still
    mislabels every stroke inside its far-side extent (measured: sel3's cd
    layer had dark-side purity 0.998 yet the dataset's handwritten labels
    were only 46% right-half by area)."""
    n = stats[:, 0]
    with np.errstate(divide="ignore", invalid="ignore"):
        dark_frac = np.where(n > 0, stats[:, 1] / np.maximum(n, 1), 0.0)
        if mode == "appearance":
            left_frac = stats[:, 5] / np.maximum(stats[:, 1], 1.0)
        elif region:
            left_frac = stats[:, 4] / np.maximum(n, 1.0)
        else:
            left_frac = stats[:, 2] / np.maximum(stats[:, 1], 1.0)
    text = dark_frac > dark_fraction
    weight = (
        np.where(text, n, 0.0)
        if region and mode != "appearance"
        else np.where(text, stats[:, 1], 0.0)
    )
    text_dark = weight
    purity_per = 2.0 * np.abs(left_frac - 0.5)
    total_text_dark = text_dark.sum()
    purity = (
        float((text_dark * purity_per).sum() / total_text_dark)
        if total_text_dark > 0 else 0.0
    )
    left_text = text & (left_frac >= left_threshold)
    right_text = text & (left_frac <= 1.0 - left_threshold)
    both_sides = bool(left_text.any() and right_text.any())
    cd_score = purity if both_sides else purity * 0.1

    total_dark = stats[:, 1].sum()
    captured = text_dark.sum()
    recall = float(captured / total_dark) if total_dark > 0 else 0.0
    text_n = np.where(text, n, 0.0).sum()
    precision = float(captured / text_n) if text_n > 0 else 0.0
    b2 = fg_beta * fg_beta
    fg_score = (
        (1 + b2) * precision * recall / (b2 * precision + recall)
        if precision + recall > 0 else 0.0
    )
    return {
        "cd_score": cd_score,
        "fg_score": fg_score,
        "purity": purity,
        "both_sides": both_sides,
        "ink_recall": recall,
        "ink_precision": precision,
        "dark_frac": dark_frac,
        "left_frac": left_frac,
        "text": text,
    }


def labels_from_stats(
    scored: dict, k: int, args
) -> dict:
    """Per-cluster class labels: side rule (legacy) or appearance rule —
    printed when the printed-like ink share clears the threshold."""
    threshold = (
        args.printed_frac_threshold
        if getattr(args, "class_mode", "side") == "appearance"
        else args.left_threshold
    )
    out = {}
    for cl in range(k):
        if scored["text"][cl]:
            out[str(cl)] = (
                args.left_class
                if scored["left_frac"][cl] >= threshold
                else args.right_class
            )
        else:
            out[str(cl)] = args.background_class
    return out


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from synthesis_in_style_tpu.core.config import load_config_from_checkpoint
    from synthesis_in_style_tpu.models.factory import load_generator
    from synthesis_in_style_tpu.segmentation.factor_catalog import (
        load_catalogs,
        save_catalogs,
    )
    from synthesis_in_style_tpu.segmentation.kmeans import (
        _valid_mask,
        k_bucket_size,
    )
    from synthesis_in_style_tpu.utils.dataset_creation import (
        build_latent_and_noise_generator,
    )

    sem_dir = Path(args.sem_dir)
    config = load_config_from_checkpoint(Path(args.checkpoint), None)
    config["batch_size"] = args.batch_size
    gen, variables = load_generator(Path(args.checkpoint), config)
    size = config["image_size"]

    catalogs_per_k = {
        k: load_catalogs(sem_dir / "catalogs" / f"{k}.npz") for k in args.ks
    }
    layer_ids = sorted(catalogs_per_k[args.ks[0]], key=int)

    @jax.jit
    def generate(z):
        img, acts = gen.apply(
            variables, [z], randomize_noise=False,
            return_intermediate_activations=True,
        )
        lum = jnp.mean(jnp.clip((img + 1.0) / 2.0, 0.0, 1.0), axis=-1)
        return lum, {str(k): v for k, v in acts.items()}

    run_len = max(5, int(round(size * args.run_len_frac)) | 1)

    def stats_fn(acts, lum, centers_p, k_pad, k_valid):
        """(k_pad, 6) per-cluster sums of [1, dark, dark&left, lum, left,
        dark&printed_like] at the layer's native resolution — one matmul,
        one tiny fetch. Appearance mode computes its per-pixel features at
        FULL page resolution (box-filter runs blur out at feature-map
        scale) and average-pools them to the layer grid, which keeps the
        per-cluster SUMS exact."""
        from synthesis_in_style_tpu.segmentation.kmeans import (
            assign_euclidean,
        )

        b, h, w, _ = acts.shape
        flat = acts.reshape(-1, acts.shape[-1])
        ids = assign_euclidean(flat, centers_p, _valid_mask(k_pad, k_valid))
        if args.class_mode == "appearance":
            S = lum.shape[1]
            dark_full = (lum < args.dark_threshold).astype(jnp.float32)

            def box(x, window):
                return jax.lax.reduce_window(
                    x, 0.0, jax.lax.add, window, (1, 1, 1),
                    [(0, 0)] + [(d // 2, d // 2) for d in window[1:]],
                ) / float(run_len)

            hrun = box(dark_full, (1, 1, run_len))
            vrun = box(dark_full, (1, run_len, 1))
            printed_like = (
                (hrun - vrun) > args.printed_margin
            ).astype(jnp.float32) * dark_full
            left = jnp.broadcast_to(
                (jnp.arange(S) < S // 2).astype(jnp.float32), (b, S, S)
            )
            feats_full = jnp.stack(
                [jnp.ones_like(dark_full), dark_full, dark_full * left,
                 lum, left, printed_like], axis=-1,
            )
            f = S // h
            feats = jax.lax.reduce_window(
                feats_full, 0.0, jax.lax.add, (1, f, f, 1), (1, f, f, 1),
                "VALID",
            ) / float(f * f)
            feats = feats.reshape(-1, 6)
        else:
            lum_small = jax.image.resize(lum, (b, h, w), method="linear")
            dark = (lum_small < args.dark_threshold).astype(jnp.float32)
            left = jnp.broadcast_to(
                (jnp.arange(w) < w // 2).astype(jnp.float32), (b, h, w)
            )
            feats = jnp.stack(
                [jnp.ones_like(dark), dark, dark * left, lum_small, left,
                 jnp.zeros_like(dark)], axis=-1,
            ).reshape(-1, 6)
        onehot = jax.nn.one_hot(ids, k_pad, dtype=jnp.float32)
        return onehot.T @ feats

    stats_jit = jax.jit(stats_fn, static_argnames=("k_pad",))

    stream = build_latent_and_noise_generator(config, seed=args.seed)
    # accumulate (layer, k) -> (k_pad, 5)
    acc = {}
    resolutions = {}
    done = 0
    while done < args.num_samples:
        latents = next(stream)
        z = jnp.asarray(
            latents.latent if hasattr(latents, "latent") else latents
        )
        lum, acts = generate(z)
        if not resolutions:
            resolutions = {
                layer: int(acts[layer].shape[1]) for layer in layer_ids
            }
        for layer in layer_ids:
            a = acts[layer]
            for k in args.ks:
                cat = catalogs_per_k[k][layer]
                k_pad = k_bucket_size(k, 8)
                centers = np.asarray(cat.cluster_centers)
                centers_p = np.zeros((k_pad, centers.shape[1]), centers.dtype)
                centers_p[:k] = centers
                s = stats_jit(a, lum, jnp.asarray(centers_p), k_pad,
                              jnp.int32(k))
                key = (layer, k)
                prev = acc.get(key)
                acc[key] = s if prev is None else prev + s
        done += z.shape[0]

    # host scoring — REGION semantics (cd threshold) and INK semantics
    # (fg threshold) scored separately per (layer, k)
    rows = []
    scored_cd_all = {}
    scored_fg_all = {}
    class_threshold = (
        args.printed_frac_threshold
        if args.class_mode == "appearance" else args.left_threshold
    )
    for (layer, k), s in acc.items():
        stats = np.asarray(s)[:k]
        scored_cd = score_stats(stats, args.cd_dark_fraction,
                                class_threshold, args.fg_beta,
                                region=True, mode=args.class_mode)
        scored_fg = score_stats(stats, args.dark_fraction,
                                class_threshold, args.fg_beta,
                                mode=args.class_mode)
        scored_cd_all[(layer, k)] = scored_cd
        scored_fg_all[(layer, k)] = scored_fg
        rows.append({
            "layer": layer, "k": k, "resolution": resolutions[layer],
            "cd_score": round(scored_cd["cd_score"], 4),
            "fg_score": round(scored_fg["fg_score"], 4),
            "purity": round(scored_cd["purity"], 4),
            "both_sides": scored_cd["both_sides"],
            "ink_recall": round(scored_fg["ink_recall"], 4),
            "ink_precision": round(scored_fg["ink_precision"], 4),
        })
    rows.sort(key=lambda r: (int(r["layer"]), r["k"]))
    for r in rows:
        print(
            f"layer {r['layer']:>2} (res {r['resolution']:>3}) k={r['k']:>2}: "
            f"cd={r['cd_score']:.3f} (purity {r['purity']:.3f}, "
            f"both={r['both_sides']}) fg={r['fg_score']:.3f} "
            f"(R {r['ink_recall']:.2f} P {r['ink_precision']:.2f})",
            flush=True,
        )

    # selection: best k per layer per role, then top layers per role
    best_cd = {}
    best_fg = {}
    for layer in layer_ids:
        cd_scored = [(k, scored_cd_all[(layer, k)]) for k in args.ks]
        fg_scored = [(k, scored_fg_all[(layer, k)]) for k in args.ks]
        bk_cd = max(cd_scored, key=lambda kv: kv[1]["cd_score"])
        bk_fg = max(fg_scored, key=lambda kv: kv[1]["fg_score"])
        best_cd[layer] = (bk_cd[0], bk_cd[1]["cd_score"])
        best_fg[layer] = (bk_fg[0], bk_fg[1]["fg_score"])

    cd_candidates = [
        layer for layer in layer_ids
        if resolutions[layer] >= args.min_cd_resolution
        and resolutions[layer] <= size // 2
    ]
    fg_candidates = [
        layer for layer in layer_ids
        if resolutions[layer] >= args.min_fg_resolution_frac * size
    ]
    cd_layers = sorted(
        cd_candidates, key=lambda l: -best_cd[l][1]
    )[: args.num_cd_layers]
    fg_layers = sorted(
        fg_candidates, key=lambda l: -best_fg[l][1]
    )[: args.num_fg_layers]
    print(f"class-determination layers: "
          f"{[(l, best_cd[l]) for l in cd_layers]}", flush=True)
    print(f"fine-grained layers: "
          f"{[(l, best_fg[l]) for l in fg_layers]}", flush=True)

    # compose the per-layer-best-k catalog + label map
    tag = args.out_tag
    composed = {}
    label_map = {}
    for layer in cd_layers + [l for l in fg_layers if l not in cd_layers]:
        # cd layers take REGION labels at their best cd k; pure fg layers
        # take INK labels at their best fg k (a layer in both roles keeps
        # the cd choice — the pipeline reads one label map per layer)
        if layer in cd_layers:
            k = best_cd[layer][0]
            scored = scored_cd_all[(layer, k)]
        else:
            k = best_fg[layer][0]
            scored = scored_fg_all[(layer, k)]
        composed[layer] = catalogs_per_k[k][layer]
        label_map[layer] = labels_from_stats(scored, k, args)
        # per-cluster diagnostics: label starvation shows up here as a
        # text class whose clusters cover almost no area
        n = np.asarray(acc[(layer, k)])[:k, 0]
        for cl in range(k):
            print(
                f"  chosen layer {layer} k={k} cluster {cl}: "
                f"area={n[cl] / max(1.0, n.sum()):.4f} "
                f"dark={scored['dark_frac'][cl]:.2f} "
                f"class_frac={scored['left_frac'][cl]:.2f} -> "
                f"{label_map[layer][str(cl)]}",
                flush=True,
            )
    save_catalogs(composed, sem_dir / "catalogs" / f"{tag}.npz")
    (sem_dir / f"merged_classes_{tag}.json").write_text(
        json.dumps(label_map)
    )

    creation_config = {
        "class_to_color_map": {
            args.background_class: "#000000",
            args.left_class: "#0000FF",
            args.right_class: "#FF0000",
        },
        "keys_for_class_determination": [str(l) for l in cd_layers],
        "keys_for_finegrained_segmentation": [str(l) for l in fg_layers],
        "keys_to_merge": {},
        "segmenter_type": "black_white_handwritten_printed",
        "only_keep_overlapping": False,
        # purity-selected regions are side-consistent by construction, so
        # clip each class's paint to its own region mask (the measured
        # cross-region leak of whole-contour classification; see
        # dataset_segmenter.clip_to_class_regions)
        "clip_to_class_regions": True,
        "fine_mask_dilation": args.fine_mask_dilation,
        "min_class_contour_area": args.min_class_contour_area,
        "seed": 1,
    }
    out_cfg = sem_dir / f"creation_config_{tag}.json"
    out_cfg.write_text(json.dumps(creation_config, indent=2))
    print(f"wrote catalogs/{tag}.npz, merged_classes_{tag}.json, {out_cfg}",
          flush=True)
    report = {
        "rows": rows,
        "cd_layers": [str(l) for l in cd_layers],
        "fg_layers": [str(l) for l in fg_layers],
        "per_layer_best_cd": {l: best_cd[l] for l in cd_layers},
        "per_layer_best_fg": {l: best_fg[l] for l in fg_layers},
    }
    (sem_dir / f"selection_report_{tag}.json").write_text(
        json.dumps(report, indent=2)
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
