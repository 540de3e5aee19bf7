"""Trained-quality capstone gate (VERDICT r3 #6).

No real WPI scans or trained reference checkpoints exist in this
environment, so trained-parity mIoU cannot be validated against the paper.
The stand-in is the full production chain on a LEARNABLE synthetic fixture
(documented in MEASUREMENTS.md "Round 3 capstone"): train a StyleGAN2 on
synthetic document pages (printed-line blocks left, handwriting squiggles
right), cluster + auto-label its activations by the fixture's layout prior,
synthesize a labelled dataset, train a DocUFCN, and sweep-evaluate.

This test asserts the capstone's committed quality floors from the
results.json the chain produces. Point SIS_CAPSTONE_RESULTS at a fresh
results.json to re-gate a rerun; without it the test validates the
committed snapshot in tests/data/capstone_results.json.
"""

import json
import os
from pathlib import Path

import pytest

DEFAULT = Path(__file__).parent / "data" / "capstone_results.json"


def _load():
    path = Path(os.environ.get("SIS_CAPSTONE_RESULTS", DEFAULT))
    if not path.exists():
        pytest.skip(f"no capstone results at {path}")
    with open(path) as f:
        return json.load(f)


def test_capstone_no_class_scores_zero():
    results = _load()
    best = max(
        results["runs"],
        key=lambda run: run["average_dice_scores"]["weighted_text_avg"]["score"],
    )
    dice = best["average_dice_scores"]
    assert dice["background"]["score"] > 0.85
    # the paper pipeline's point: handwritten/printed separation is
    # learnable from purely synthetic labels. Round 2's random-weight
    # capstone scored 0.0 on all text; round 4's position-coded chain
    # scored handwritten 0.002 (argmax-absent); the round-5
    # appearance-coded 256px chain (trained 256px generator, measured
    # cluster-config selection, augmentation ON) scores printed 0.507 /
    # handwritten 0.575 on held-out pages — median per-page handwritten
    # dice 0.526, 75% of pages above 0.2 (MEASUREMENTS.md round 5)
    assert dice["printed_text"]["score"] > 0.3
    assert dice["handwritten_text"]["score"] > 0.25


def test_capstone_weighted_quality_floor():
    results = _load()
    best = max(
        results["runs"],
        key=lambda run: run["average_dice_scores"]["weighted_avg"]["score"],
    )
    assert best["average_dice_scores"]["weighted_avg"]["score"] > 0.8
    assert best["average_iou_scores"]["weighted_avg"]["score"] > 0.7
