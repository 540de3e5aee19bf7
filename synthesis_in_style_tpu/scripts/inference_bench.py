"""Serving-side inference benchmark: whole-page patch-based segmentation
throughput through `VotingAssemblySegmenter` (the production inference path
used by `cli.analyze_image_segments`).

Measures pages/s and ms/page at realistic document sizes (multi-patch
tiling + on-device jitted forward + voting assembly + host contour-area
postprocess), warmed, on the real chip. The reference's equivalent path is
analysis_segmenter.py:130-223 (per-patch torch forward + CPU assembly); it
publishes no numbers (BASELINE.md), so these are the rebuild's own serving
baselines.

Usage (on the TPU):
  python -m synthesis_in_style_tpu.scripts.inference_bench \
      --checkpoint <ckpt_dir> --color-map <colors.json> \
      [--sizes 512x512,1024x768,2048x1536] [--pages 8] [--batch 8]

Without --checkpoint, a randomly-initialized DocUFCN checkpoint + 3-class
color map are synthesized into a temp run dir (throughput is
weight-independent).
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time
from pathlib import Path

import numpy as np
from PIL import Image


def _make_synthetic_checkpoint(
    root: Path, patch_size: int, s2d_stem: bool = False, s2d_tail: bool = False
) -> tuple:
    import jax
    import jax.numpy as jnp

    from synthesis_in_style_tpu.models.doc_ufcn import DocUFCN
    from synthesis_in_style_tpu.utils.checkpoint import save_pytree

    run_dir = root / "run"
    ckpt_dir = run_dir / "checkpoints" / "iter_00000001"
    colors = {
        "background": "#000000",
        "printed_text": "#0000FF",
        "handwritten_text": "#FF0000",
    }
    color_path = root / "colors.json"
    color_path.write_text(json.dumps(colors))
    config = {
        "network": "DocUFCN",
        "num_classes": 3,
        "input_dim": 3,
        "image_size": patch_size,
        "batch_size": 8,
        "class_to_color_map": str(color_path),
        "s2d_stem": s2d_stem,
        "s2d_tail": s2d_tail,
    }
    (run_dir / "config").mkdir(parents=True, exist_ok=True)
    (run_dir / "config" / "config.json").write_text(json.dumps(config))
    model = DocUFCN(num_classes=3)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1, patch_size, patch_size, 3)),
        train=False,
    )
    save_pytree(ckpt_dir, {"segmentation_network": variables})
    return ckpt_dir, color_path


def _synthetic_page(rng: np.random.Generator, width: int, height: int) -> Image.Image:
    """Document-like page: bright background + dark text-ish bars."""
    page = np.full((height, width, 3), 235, np.uint8)
    for _ in range(30):
        y = int(rng.integers(0, max(1, height - 12)))
        x0 = int(rng.integers(0, width // 4))
        x1 = int(rng.integers(width // 2, width))
        page[y : y + int(rng.integers(3, 10)), x0:x1] = int(rng.integers(20, 90))
    return Image.fromarray(page)


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--color-map", default=None)
    parser.add_argument("--sizes", default="512x512,1024x768,2048x1536")
    parser.add_argument("--pages", type=int, default=8)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--min-confidence", type=float, default=0.7)
    parser.add_argument("--min-contour-area", type=int, default=55)
    parser.add_argument("--fused", action="store_true", default=False,
                        help="Whole page as ONE jitted program (device "
                        "patch extraction + forward + component filter + "
                        "voting assembly).")
    parser.add_argument("--pages-per-batch", type=int, default=0,
                        help="Throughput mode: segment_images with N "
                        "same-tiling pages per fused dispatch (implies "
                        "--fused).")
    parser.add_argument("--classes", action="store_true", default=False,
                        help="Fetch device-argmaxed uint8 class canvases "
                        "(segment_image_classes) instead of f32 "
                        "confidences — the evaluation consumer's path.")
    parser.add_argument("--mesh", type=int, default=0,
                        help="Multi-chip serving: shard the page axis of "
                        "segment_images over an N-device ('data',) mesh "
                        "(requires --pages-per-batch > 1).")
    parser.add_argument("--quantized", action="store_true", default=False,
                        help="Static w8a8 int8 patch forward (DocUFCN "
                        "only), calibrated on the first page — "
                        "models/doc_ufcn_quant.py.")
    parser.add_argument("--serving-dtype", default=None,
                        choices=["float32", "bfloat16"],
                        help="Compute dtype for the patch forward "
                        "(default float32).")
    parser.add_argument("--s2d-stem", action="store_true", default=False,
                        help="DocUFCN space-to-depth stem (exact "
                        "re-lowering of encoder block 0; config key "
                        "s2d_stem) — models/doc_ufcn.py.")
    parser.add_argument("--s2d-tail", action="store_true", default=False,
                        help="DocUFCN space-to-depth decoder tail (exact; "
                        "config key s2d_tail) — models/doc_ufcn.py.")
    args = parser.parse_args()

    import jax

    from synthesis_in_style_tpu.segmentation.analysis_segmenter import (
        VotingAssemblySegmenter,
    )

    print(f"devices: {jax.devices()}", flush=True)
    tmp = None
    if args.checkpoint is None:
        tmp = tempfile.TemporaryDirectory(prefix="infbench_")
        ckpt, color_map = _make_synthetic_checkpoint(
            Path(tmp.name), 256, s2d_stem=args.s2d_stem, s2d_tail=args.s2d_tail
        )
    else:
        ckpt, color_map = args.checkpoint, args.color_map
        if args.s2d_stem or args.s2d_tail:
            print("--s2d-stem/--s2d-tail with an explicit checkpoint: set "
                  "'s2d_stem'/'s2d_tail' in the run config instead", flush=True)

    mesh = None
    if args.mesh > 1:
        from synthesis_in_style_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.mesh)
    segmenter = VotingAssemblySegmenter(
        ckpt,
        class_to_color_map=color_map,
        print_progress=False,
        fused_page_inference=args.fused or args.pages_per_batch > 1,
        mesh=mesh,
        quantized=args.quantized,
        serving_dtype=args.serving_dtype,
    )
    segmenter.set_hyperparams(
        {
            "min_confidence": args.min_confidence,
            "min_contour_area": args.min_contour_area,
            "patch_overlap": [0, 0.0],
        }
    )

    rng = np.random.default_rng(0)
    results = []
    for spec in args.sizes.split(","):
        w, h = (int(v) for v in spec.split("x"))
        pages = [_synthetic_page(rng, w, h) for _ in range(args.pages)]
        output = "classes" if args.classes else "probs"
        if args.pages_per_batch > 1:
            # warm/compile the batched program for this tiling
            segmenter.segment_images(
                pages[: args.pages_per_batch], args.pages_per_batch, output
            )
            t0 = time.perf_counter()
            outs = segmenter.segment_images(pages, args.pages_per_batch, output)
            assert all(o is not None for o in outs)
            dt = time.perf_counter() - t0
        else:
            one_page = (
                segmenter.segment_image_classes
                if args.classes
                else segmenter.segment_image
            )
            one_page(pages[0])  # warm/compile for this tiling
            t0 = time.perf_counter()
            for page in pages:
                out = one_page(page)
                assert out is not None
            dt = time.perf_counter() - t0
        per = dt / len(pages)
        results.append(
            {
                "size": spec,
                "ms_per_page": round(per * 1e3, 1),
                "pages_per_s": round(1.0 / per, 2),
            }
        )
        print(
            f"{spec}: {per * 1e3:.1f} ms/page = {1.0 / per:.2f} pages/s "
            f"({len(segmenter.calculate_bboxes_for_patches(w, h))} patches)",
            flush=True,
        )
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
