"""Purity-scored cluster-config selection (scripts/select_cluster_config) —
host scoring rules that replace the reference's human layer-role/k choice
(reference configs/dataset_creation/stylegan2_cluster_based_bw_hwp_wpi.json:7-13)."""

import argparse

import numpy as np

from synthesis_in_style_tpu.scripts.select_cluster_config import (
    labels_from_stats,
    score_stats,
)

ARGS = argparse.Namespace(
    left_class="printed_text", right_class="handwritten_text",
    background_class="background", left_threshold=0.6,
)


def make_stats(rows):
    """rows: (n, n_dark, n_dark_left, lum_sum, n_left)."""
    return np.asarray(rows, np.float64)


def test_separating_layer_scores_high():
    # cluster 0: pure-left text, cluster 1: pure-right text, cluster 2: paper
    stats = make_stats([
        [1000, 900, 880, 100, 900],
        [1000, 850, 30, 120, 80],
        [8000, 100, 50, 7200, 4000],
    ])
    s = score_stats(stats, dark_fraction=0.4, left_threshold=0.6)
    assert s["both_sides"]
    assert s["cd_score"] > 0.9
    labels = labels_from_stats(s, 3, ARGS)
    assert labels == {"0": "printed_text", "1": "handwritten_text",
                      "2": "background"}


def test_mixed_layer_scores_low():
    # one big text cluster straddling both halves (round-3 failure mode:
    # dark-left fractions 0.4-0.6 at blanket k)
    stats = make_stats([
        [2000, 1700, 880, 250, 1000],
        [8000, 100, 50, 7200, 4000],
    ])
    s = score_stats(stats, dark_fraction=0.4, left_threshold=0.6)
    assert not s["both_sides"]
    assert s["cd_score"] < 0.05


def test_fg_score_is_ink_f1():
    # text clusters capture 90% of dark mass at 90% precision
    stats = make_stats([
        [1000, 900, 450, 100, 500],
        [9000, 100, 50, 8100, 4500],
    ])
    s = score_stats(stats, dark_fraction=0.4, left_threshold=0.6)
    assert abs(s["ink_recall"] - 0.9) < 1e-6
    assert abs(s["ink_precision"] - 0.9) < 1e-6
    assert abs(s["fg_score"] - 0.9) < 1e-6


def test_empty_clusters_do_not_crash():
    stats = make_stats([[0, 0, 0, 0, 0], [100, 0, 0, 90, 50]])
    s = score_stats(stats, dark_fraction=0.4, left_threshold=0.6)
    assert s["cd_score"] == 0.0 and s["fg_score"] == 0.0


def test_region_semantics_judges_area_not_ink():
    """A cluster whose ink is side-pure but whose AREA straddles the page
    must score low as a REGION (the pipeline paints its full extent) while
    still scoring high under ink semantics (sel3 failure mode)."""
    # n=1000, dark=300 all on the right (dark_left=0), area half-left
    stats = make_stats([
        [1000, 300, 0, 600, 500],
        [1000, 280, 270, 610, 480],  # counterpart: ink mostly left
        [8000, 100, 50, 7200, 4000],
    ])
    ink = score_stats(stats, dark_fraction=0.15, left_threshold=0.6)
    region = score_stats(stats, dark_fraction=0.15, left_threshold=0.6,
                         region=True)
    assert ink["purity"] > 0.9       # ink sides are pure
    assert region["purity"] < 0.1    # areas straddle the page


APPEARANCE_ARGS = argparse.Namespace(
    left_class="printed_text", right_class="handwritten_text",
    background_class="background", left_threshold=0.6,
    class_mode="appearance", printed_frac_threshold=0.55,
)


def make_stats6(rows):
    """rows: (n, n_dark, n_dark_left, lum_sum, n_left, n_dark_printed)."""
    return np.asarray(rows, np.float64)


def test_appearance_mode_separates_by_stroke_statistics():
    """Class purity must come from the printed-like ink share, independent
    of WHERE the clusters sit (VERDICT r4 weak #2: side-purity can't score
    appearance-coded or real collections)."""
    # cluster 0: printed strokes (98% printed-like ink), area mostly RIGHT
    # cluster 1: handwriting (9% printed-like ink), area mostly LEFT
    # cluster 2: paper
    stats = make_stats6([
        [1000, 900, 100, 100, 100, 882],
        [1000, 850, 800, 120, 920, 77],
        [8000, 100, 50, 7200, 4000, 50],
    ])
    s = score_stats(stats, dark_fraction=0.4, left_threshold=0.55,
                    mode="appearance")
    assert s["both_sides"]          # both appearance classes present
    assert s["cd_score"] > 0.8
    labels = labels_from_stats(s, 3, APPEARANCE_ARGS)
    assert labels == {"0": "printed_text", "1": "handwritten_text",
                      "2": "background"}
    # the SAME stats under the legacy side rule mislabel both text clusters
    side = score_stats(stats, dark_fraction=0.4, left_threshold=0.6)
    side_labels = labels_from_stats(side, 3, ARGS)
    assert side_labels["0"] == "handwritten_text"  # printed sits right
    assert side_labels["1"] == "printed_text"      # handwriting sits left


def test_appearance_mixed_cluster_scores_low():
    # one text cluster blending both stroke types (printed-like share ~0.5)
    stats = make_stats6([
        [2000, 1700, 900, 250, 1000, 860],
        [8000, 100, 50, 7200, 4000, 40],
    ])
    s = score_stats(stats, dark_fraction=0.4, left_threshold=0.55,
                    mode="appearance")
    assert not s["both_sides"]
    assert s["cd_score"] < 0.05


def test_appearance_region_semantics_uses_ink_not_area():
    """In appearance mode a region's class IS its ink appearance — the
    side-mode area/ink split collapses; region=True must not fall back to
    area-side statistics."""
    stats = make_stats6([
        [1000, 300, 0, 600, 500, 294],   # printed ink, area straddles
        [1000, 280, 270, 610, 480, 25],  # handwriting ink, area straddles
        [8000, 100, 50, 7200, 4000, 50],
    ])
    region = score_stats(stats, dark_fraction=0.15, left_threshold=0.55,
                         region=True, mode="appearance")
    assert region["purity"] > 0.8
    assert region["both_sides"]
