"""Generator-quality TREND gate (VERDICT r3 #5): relative FID with one
fixed pinned-seed embedding must IMPROVE with training — FID(trained
later) < FID(trained earlier) < FID(random init) on the capstone run
(scripts/fid_trend.py; reference quality loop extensions/fid_score.py:16-39).

Validates the committed artifact tests/data/fid_trend.json; point
SIS_FID_TREND at a fresh fid_trend.json to re-gate a rerun.
"""

import json
import os
from pathlib import Path

import pytest

DEFAULT = Path(__file__).parent / "data" / "fid_trend.json"


def _load():
    path = Path(os.environ.get("SIS_FID_TREND", DEFAULT))
    if not path.exists():
        pytest.skip(f"no fid trend artifact at {path}")
    with open(path) as f:
        return json.load(f)


def test_fid_decreases_with_training():
    data = _load()
    scores = data["checkpoints"]
    assert "init" in scores and len(scores) >= 3
    snaps = sorted(k for k in scores if k != "init")
    # strictly better than random init, and the trend improves end-to-end
    assert scores[snaps[0]] < scores["init"]
    assert scores[snaps[-1]] < scores[snaps[0]]


def test_fid_trend_metadata():
    data = _load()
    assert data["num_samples"] >= 128
    assert "embedding" in data  # provenance: relative vs calibrated
