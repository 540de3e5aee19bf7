"""Generate the APPEARANCE-coded capstone fixture: synthetic document pages
whose printed/handwritten distinction is stroke appearance, not position.

The round-3/4 capstone fixture coded class BY POSITION (printed left,
handwriting right), which real collections never do: geometric augmentation
destroyed the classes and eval transfer hinged on the GAN reproducing layout
statistics exactly (MEASUREMENTS.md round-4 lessons 5-6). This generator
replaces it:

* printed_text: blocks of perfectly straight horizontal ruled dash lines on
  regular baselines (machine-set type) — long horizontal dark runs, near-zero
  curvature.
* handwritten_text: loopy cursive squiggle strokes (cycloid-like pen traces
  with drifting loop radius/frequency) — high curvature, no dominant
  horizontal run.
* Blocks of either class are placed ANYWHERE on the page (rejection-sampled
  non-overlapping), so only appearance separates the classes — the same
  signal a human uses in the reference's labeller UI
  (/root/reference/stylegan_code_finder/labeller, consumed at
  base_cluster_based_dataset_segmenter.py:56-67).

Output layout (consumed by cli.train_stylegan_2 + cli.analyze_image_segments):

  <out>/pages/page_00000.png ...      GAN training pages
  <out>/train.json, <out>/val.json    manifests (list of relative paths)
  <out>/eval/images/eval_00000.png    held-out pages (fresh seed stream)
  <out>/eval/gt/eval_00000_gt.png     color GT masks (#000000 background,
                                      #0000FF printed, #FF0000 handwritten)

Usage:
  python -m synthesis_in_style_tpu.scripts.make_capstone_fixture <out> \
      --size 128 --num-pages 768 --num-eval 64 [--seed 3]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import cv2
import numpy as np
from PIL import Image


def _paper(rng: np.random.Generator, size: int) -> np.ndarray:
    """Light paper background with low-frequency shading + fine grain."""
    base = rng.uniform(225, 248)
    coarse = cv2.resize(
        rng.normal(0.0, 6.0, (size // 16 + 1, size // 16 + 1)).astype(np.float32),
        (size, size), interpolation=cv2.INTER_CUBIC,
    )
    grain = rng.normal(0.0, 2.0, (size, size)).astype(np.float32)
    page = np.clip(base + coarse + grain, 200, 255)
    return page


def _draw_printed_block(
    ink: np.ndarray, rng: np.random.Generator, box, scale: float
) -> None:
    """Straight horizontal dash rows on regular baselines inside `box`."""
    x0, y0, w, h = box
    spacing = max(4, int(round(rng.uniform(6, 10) * scale)))
    thickness = max(1, int(round(rng.uniform(1.0, 1.6) * scale)))
    y = y0 + spacing // 2
    while y < y0 + h - thickness:
        x = x0 + int(rng.integers(0, max(1, int(4 * scale))))
        while x < x0 + w - 3:
            dash = int(round(rng.uniform(6, 18) * scale))
            gap = int(round(rng.uniform(2, 5) * scale))
            x1 = min(x + dash, x0 + w - 1)
            cv2.line(ink, (x, y), (x1, y), 1.0, thickness)
            x = x1 + gap
        y += spacing


def _draw_handwritten_block(
    ink: np.ndarray, rng: np.random.Generator, box, scale: float
) -> None:
    """Loopy cursive squiggle strokes: cycloid pen traces with drifting
    radius/frequency — high curvature, orientation-diverse."""
    x0, y0, w, h = box
    thickness = max(1, int(round(rng.uniform(1.0, 1.5) * scale)))
    n_rows = max(1, int(h / max(1.0, rng.uniform(10, 16) * scale)))
    row_h = h / n_rows
    for r in range(n_rows):
        yc = y0 + (r + 0.5) * row_h
        t = np.linspace(0.0, 1.0, max(32, int(w * 4)))
        radius = rng.uniform(2.2, 4.5) * scale
        radius_mod = 1.0 + 0.5 * np.sin(
            2 * np.pi * rng.uniform(0.5, 2.0) * t + rng.uniform(0, 2 * np.pi)
        )
        loops = w / (rng.uniform(4.0, 7.0) * scale)
        phase = 2 * np.pi * loops * t + rng.uniform(0, 2 * np.pi)
        drift = np.cumsum(rng.normal(0, 0.35 * scale, t.shape))
        drift -= np.linspace(0, drift[-1], len(drift))
        xs = x0 + t * (w - 1) + radius * radius_mod * np.cos(phase) * 0.6
        ys = yc + radius * radius_mod * np.sin(phase) + drift
        xs = np.clip(xs, x0, x0 + w - 1)
        ys = np.clip(ys, y0, y0 + h - 1)
        pts = np.stack([xs, ys], axis=-1).round().astype(np.int32)
        cv2.polylines(ink, [pts], False, 1.0, thickness)


def _place_blocks(rng: np.random.Generator, size: int, n_blocks: int):
    """Rejection-sample non-overlapping block boxes anywhere on the page."""
    scale = size / 128.0
    boxes = []
    for _ in range(n_blocks):
        for _attempt in range(60):
            w = int(rng.uniform(30, 62) * scale)
            h = int(rng.uniform(18, 46) * scale)
            x0 = int(rng.integers(2, max(3, size - w - 2)))
            y0 = int(rng.integers(2, max(3, size - h - 2)))
            pad = int(3 * scale)
            clash = any(
                not (x0 + w + pad < bx or bx + bw + pad < x0
                     or y0 + h + pad < by or by + bh + pad < y0)
                for bx, by, bw, bh in boxes
            )
            if not clash:
                boxes.append((x0, y0, w, h))
                break
    return boxes


def render_page(rng: np.random.Generator, size: int):
    """One page + per-class ink masks. Returns (rgb uint8, printed mask,
    handwritten mask) with masks in {0,1} uint8 at stroke-pixel precision."""
    scale = size / 128.0
    page = _paper(rng, size)
    # class mix: most pages have both, some single-class (keeps clusters
    # honest — a class must be recognizable without the other present)
    mix = rng.uniform()
    if mix < 0.70:
        n_printed, n_hand = rng.integers(2, 5), rng.integers(2, 5)
    elif mix < 0.85:
        n_printed, n_hand = rng.integers(3, 7), 0
    else:
        n_printed, n_hand = 0, rng.integers(3, 7)
    boxes = _place_blocks(rng, size, int(n_printed + n_hand))
    printed = np.zeros((size, size), np.float32)
    hand = np.zeros((size, size), np.float32)
    for i, box in enumerate(boxes):
        if i < n_printed:
            _draw_printed_block(printed, rng, box, scale)
        else:
            _draw_handwritten_block(hand, rng, box, scale)
    ink = np.clip(printed + hand, 0, 1)
    ink_tone = rng.uniform(15, 70)
    img = page * (1 - ink) + ink * (
        ink_tone + rng.normal(0, 6, page.shape).astype(np.float32) * ink
    )
    img = np.clip(img, 0, 255).astype(np.uint8)
    rgb = np.stack([img] * 3, axis=-1)
    return rgb, (printed > 0).astype(np.uint8), (hand > 0).astype(np.uint8)


def gt_color_image(printed: np.ndarray, hand: np.ndarray) -> np.ndarray:
    """Color GT mask matching the creation-config class_to_color_map
    (background #000000, printed_text #0000FF, handwritten_text #FF0000)."""
    gt = np.zeros((*printed.shape, 3), np.uint8)
    gt[printed > 0] = (0, 0, 255)
    gt[hand > 0] = (255, 0, 0)
    return gt


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("out")
    parser.add_argument("--size", type=int, default=128)
    parser.add_argument("--num-pages", type=int, default=768)
    parser.add_argument("--num-eval", type=int, default=64)
    parser.add_argument("--val-frac", type=float, default=0.1)
    parser.add_argument("--seed", type=int, default=3)
    args = parser.parse_args(argv)

    out = Path(args.out)
    (out / "pages").mkdir(parents=True, exist_ok=True)
    (out / "eval" / "images").mkdir(parents=True, exist_ok=True)
    (out / "eval" / "gt").mkdir(parents=True, exist_ok=True)

    rng = np.random.default_rng(args.seed)
    names = []
    for i in range(args.num_pages):
        rgb, _, _ = render_page(rng, args.size)
        name = f"pages/page_{i:05d}.png"
        Image.fromarray(rgb).save(out / name)
        names.append(name)
    n_val = max(1, int(len(names) * args.val_frac))
    (out / "train.json").write_text(json.dumps(names[n_val:]))
    (out / "val.json").write_text(json.dumps(names[:n_val]))

    eval_rng = np.random.default_rng(args.seed + 100_000)
    for i in range(args.num_eval):
        rgb, printed, hand = render_page(eval_rng, args.size)
        Image.fromarray(rgb).save(out / "eval" / "images" / f"eval_{i:05d}.png")
        Image.fromarray(gt_color_image(printed, hand)).save(
            out / "eval" / "gt" / f"eval_{i:05d}_gt.png"
        )
    print(
        f"wrote {len(names)} pages ({n_val} val) + {args.num_eval} eval "
        f"pairs at {args.size}px under {out}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
