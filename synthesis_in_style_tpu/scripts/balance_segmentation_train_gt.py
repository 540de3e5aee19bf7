"""Class-balance a synthetic segmentation train.json by subsampling to the
smallest class bucket (reference
scripts/balance_segmentation_train_gt.py:17-45): items are bucketed by their
`has_<class>` flags into all / none / per-class groups, each truncated to
the smallest group's size.

Usage:
  python -m synthesis_in_style_tpu.scripts.balance_segmentation_train_gt \
      train.json
"""

from __future__ import annotations

import argparse
import json
import random
from collections import defaultdict
from pathlib import Path


def balance_gt(gt_data: list, seed: int = None) -> list:
    if seed is not None:
        random.seed(seed)
    class_to_items = defaultdict(list)
    class_keys = [key for key in gt_data[0] if "has" in key]

    for gt_item in gt_data:
        matches = [gt_item[key] for key in class_keys]
        if all(matches):
            class_to_items["all"].append(gt_item)
        elif not any(matches):
            class_to_items["none"].append(gt_item)
        else:
            for key, match in zip(class_keys, matches):
                if match:
                    class_to_items[key].append(gt_item)

    smallest = min(len(v) for v in class_to_items.values())
    print(f"keeping {smallest} files per class")

    kept = []
    for key in class_to_items:
        random.shuffle(class_to_items[key])
        kept.extend(class_to_items[key][:smallest])
    random.shuffle(kept)
    return kept


def main(args: argparse.Namespace) -> None:
    gt_path = Path(args.gt)
    with gt_path.open() as f:
        gt_data = json.load(f)
    kept = balance_gt(gt_data)
    dest = gt_path.parent / f"{gt_path.stem}_balanced.json"
    with dest.open("w") as f:
        json.dump(kept, f)
    print(f"wrote {dest}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Take train gt for semantic segmentation training and "
        "balance it"
    )
    parser.add_argument("gt", help="Path to JSON holding gt to balance")
    main(parser.parse_args())
