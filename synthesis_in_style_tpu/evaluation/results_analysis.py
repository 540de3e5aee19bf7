"""Results post-processing shared by the evaluation CLIs.

Capability parity with the reference
(/root/reference/stylegan_code_finder/segmentation/evaluation/evaluation_utils.py:8-72
and the analysis half of evaluate_metrics.py:28-147 /
extract_results_subset.py:12-47): tabular arrangement of sweep runs, best /
best-median hyperparameter tables (pandas), config lookup, unweighted mIoU
substitution, subset recomputation from stored confusion matrices."""

from __future__ import annotations

import itertools
import operator
import statistics
from collections import defaultdict
from typing import Dict, List, Tuple

import numpy as np
import pandas

from synthesis_in_style_tpu.evaluation.metrics import calculate_metric


def get_calculated_score_key_filters(results: dict, score_key: str = "average") -> List[str]:
    return [key for key in results["runs"][0].keys() if score_key in key]


def extract_score_name(score_key_filter: str) -> str:
    parts = score_key_filter.split("_")
    assert len(parts) == 3, (
        "score keys must consist of three parts delimited by '_' "
        "('average_dice_score)"
    )
    return parts[1]


def calculate_mean_iou(scores: dict) -> float:
    """(reference evaluation_utils.py:19-25) — unweighted mean over the three
    document classes."""
    return (
        scores["background"]["score"]
        + scores["printed_text"]["score"]
        + scores["handwritten_text"]["score"]
    ) / 3.0


def add_mean_iou(results: dict) -> None:
    """Replace the weighted average IoU with the unweighted mIoU
    (reference :28-36)."""
    for run in results["runs"]:
        run["average_iou_scores"]["weighted_avg"]["score"] = calculate_mean_iou(
            run["average_iou_scores"]
        )
        for sample, scores in run["detailed_iou_scores"].items():
            scores["weighted_avg"]["score"] = calculate_mean_iou(scores)


def preprocess_results(results: dict) -> None:
    """Flatten the (absolute, factor) patch_overlap tuple (reference :39-43)."""
    for run in results["runs"]:
        if "patch_overlap" in run["hyperparams"] and isinstance(
            run["hyperparams"]["patch_overlap"], (list, tuple)
        ):
            assert run["hyperparams"]["patch_overlap"][0] == 0, (
                "Code assumes that patch overlap is given as float."
            )
            run["hyperparams"]["patch_overlap"] = run["hyperparams"][
                "patch_overlap"
            ][1]


def group_results_by_hyperparam_values(hyperparam_values: list, results) -> Tuple[list, list]:
    grouped = [
        list(el)
        for _, el in itertools.groupby(
            sorted(zip(hyperparam_values, results)), operator.itemgetter(0)
        )
    ]
    return [[el[1] for el in g] for g in grouped], [g[0][0] for g in grouped]


def get_tabular_results(results: dict, score_key: str):
    """(reference :55-72)."""
    hyperparam_names = tuple(results["runs"][0]["hyperparams"].keys())
    score_class_names = tuple(results["runs"][0][score_key].keys())
    table = np.zeros(
        (len(results["runs"]), len(hyperparam_names) + len(score_class_names))
    )
    for run_id, run in enumerate(results["runs"]):
        table[run_id] = tuple(run["hyperparams"].values()) + tuple(
            v["score"] for v in run[score_key].values()
        )
    return table, score_class_names, hyperparam_names


def get_best_results(results: dict, score_key: str) -> pandas.DataFrame:
    """Best hyperparameters per class (reference evaluate_metrics.py:29-46)."""
    best: Dict[str, dict] = {}
    for run in results["runs"]:
        for class_name, v in run[score_key].items():
            if v["score"] > best.get(class_name, {score_key: 0.0})[score_key]:
                best[class_name] = {score_key: v["score"], **run["hyperparams"]}
    table = defaultdict(list)
    for class_name, metrics in best.items():
        table["class"].append(class_name)
        for k, v in metrics.items():
            table[k].append(v)
    return pandas.DataFrame(data=table)


def get_best_median_configs(
    tabular_results, hyperparam_names, score_class_names, score_name
) -> Dict[str, pandas.DataFrame]:
    """(reference evaluate_metrics.py:49-74)."""
    best_median: Dict[str, dict] = defaultdict(dict)
    num_hp = len(hyperparam_names)
    for hp_id, hp_name in enumerate(hyperparam_names):
        hp_values = [str(v) for v in tabular_results[:, hp_id]]
        for class_id, class_name in enumerate(score_class_names):
            column = tabular_results[:, num_hp + class_id]
            groups, labels = group_results_by_hyperparam_values(hp_values, column)
            medians = [(l, statistics.median(g)) for l, g in zip(labels, groups)]
            best_median[hp_name][class_name] = sorted(
                medians, key=lambda x: x[1], reverse=True
            )[0]

    frames = {}
    for hp_name, metrics in best_median.items():
        table = defaultdict(list)
        for class_name, (value, median) in metrics.items():
            table["class"].append(class_name)
            table["hyperarameter value"].append(value)
            table[f"best median {score_name} score"].append(median)
        frames[hp_name] = pandas.DataFrame(data=table)
    return frames


def are_configs_matching(hyperparam_config: dict, run_config: dict) -> bool:
    for k, v in hyperparam_config.items():
        assert k in run_config, (
            f"{k} is not present in the hyperparameter config of the results"
        )
        if not run_config[k] == type(run_config[k])(v):
            return False
    return True


def get_result_for_given_config(raw_config: List[str], results: dict) -> List[dict]:
    """(reference evaluate_metrics.py:118-133)."""
    hyperparam_config = dict(zip(raw_config[::2], raw_config[1::2]))
    matching = []
    for run in results["runs"]:
        if are_configs_matching(hyperparam_config, run["hyperparams"]):
            merged = dict(run["hyperparams"])
            for score_key in filter(lambda x: "average" in x, run.keys()):
                name = extract_score_name(score_key)
                merged.update(
                    {f"{name}_{k}": v["score"] for k, v in run[score_key].items()}
                )
            matching.append(merged)
    return matching


def get_dataframe_from_results(matching_results: List[dict]) -> pandas.DataFrame:
    table = defaultdict(list)
    for result in matching_results:
        for k, v in result.items():
            table[k].append(v)
    return pandas.DataFrame(data=table)


# ---------------- subset recomputation (extract_results_subset.py) ----------

def remove_not_in_subset(results: dict, subset: List[str]) -> None:
    metrics = ["confusion_matrices"] + get_calculated_score_key_filters(
        results, "detailed"
    )
    for run in results["runs"]:
        for metric in metrics:
            for key in list(run[metric].keys()):
                if key not in subset:
                    run[metric].pop(key, None)


def compute_confusion_matrix(run: dict, num_classes: int) -> np.ndarray:
    matrices = [
        np.asarray(v).reshape((num_classes, num_classes))
        for v in run["confusion_matrices"].values()
    ]
    return np.stack(matrices, axis=0).sum(axis=0)


def recompute_metrics(results: dict) -> None:
    keys = get_calculated_score_key_filters(results, "average")
    class_names = [
        name
        for name in results["runs"][0][keys[0]].keys()
        if "weighted" not in name
    ]
    for run in results["runs"]:
        cm = compute_confusion_matrix(run, len(class_names))
        for key in keys:
            run[key] = calculate_metric(cm, class_names, extract_score_name(key))
