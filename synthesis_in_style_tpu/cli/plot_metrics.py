"""Boxplot the sweep results (reference
segmentation/evaluation/plot_metrics.py): per-hyperparameter average-score
boxplots, per-image score distributions, and class-wise distributions.

Usage:
  python -m synthesis_in_style_tpu.cli.plot_metrics results.json figures/ [-c]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from synthesis_in_style_tpu.evaluation.results_analysis import (  # noqa: E402
    add_mean_iou,
    extract_score_name,
    get_calculated_score_key_filters,
    get_tabular_results,
    group_results_by_hyperparam_values,
    preprocess_results,
)


def plot_average_results(results: dict, score_key: str, out_dir: Path) -> None:
    """Boxplots of the average score grouped by each hyperparameter value
    (reference plot_average_results :28-82, condensed)."""
    tabular, score_class_names, hyperparam_names = get_tabular_results(
        results, score_key
    )
    score_name = extract_score_name(score_key)
    num_hp = len(hyperparam_names)
    for hp_id, hp_name in enumerate(hyperparam_names):
        hp_values = [str(v) for v in tabular[:, hp_id]]
        fig, ax = plt.subplots(figsize=(8, 5))
        offset = 0
        for class_id, class_name in enumerate(score_class_names):
            column = tabular[:, num_hp + class_id]
            groups, labels = group_results_by_hyperparam_values(hp_values, column)
            positions = [
                offset + i * (len(score_class_names) + 1) for i in range(len(groups))
            ]
            ax.boxplot(groups, positions=positions, widths=0.8)
            offset += 1
        group_count = len(set(hp_values))
        ax.set_xticks(
            [
                i * (len(score_class_names) + 1) + len(score_class_names) / 2 - 0.5
                for i in range(group_count)
            ]
        )
        ax.set_xticklabels(sorted(set(hp_values)))
        ax.set_xlabel(hp_name)
        ax.set_ylabel(score_name)
        ax.set_title(f"{score_name} by {hp_name}")
        fig.tight_layout()
        fig.savefig(out_dir / f"{score_name}_by_{hp_name}.png")
        plt.close(fig)


def plot_results_per_image(results: dict, score_key: str, out_dir: Path) -> None:
    """(reference plot_results_per_image :85-114, condensed)."""
    detailed_key = score_key.replace("average", "detailed")
    if detailed_key not in results["runs"][0]:
        return
    score_name = extract_score_name(score_key)
    per_image = {}
    for run in results["runs"]:
        for image_name, scores in run[detailed_key].items():
            per_image.setdefault(image_name, []).append(
                scores["weighted_avg"]["score"]
            )
    fig, ax = plt.subplots(figsize=(max(8, len(per_image) * 0.5), 5))
    ax.boxplot(list(per_image.values()))
    ax.set_xticklabels(list(per_image.keys()), rotation=90)
    ax.set_ylabel(score_name)
    fig.tight_layout()
    fig.savefig(out_dir / f"{score_name}_per_image.png")
    plt.close(fig)


def main(args: argparse.Namespace) -> None:
    with open(args.results_path) as f:
        results = json.load(f)
    preprocess_results(results)
    if args.calculate_mean_iou:
        add_mean_iou(results)
    args.figure_out_dir.mkdir(parents=True, exist_ok=True)
    for score_key in get_calculated_score_key_filters(results, "average"):
        plot_average_results(results, score_key, args.figure_out_dir)
        plot_results_per_image(results, score_key, args.figure_out_dir)
    print(f"figures written to {args.figure_out_dir}")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        "Plots various metrics for the results of a segmentation model"
    )
    parser.add_argument("results_path", type=Path)
    parser.add_argument("figure_out_dir", type=Path)
    parser.add_argument("-c", "--calculate-mean-iou", action="store_true",
                        default=False)
    return parser


if __name__ == "__main__":
    main(build_parser().parse_args())
