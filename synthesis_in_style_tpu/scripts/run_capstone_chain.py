"""ONE timed end-to-end capstone chain: cluster discovery -> measured
cluster-config selection -> labelled synthesis -> DocUFCN training -> sweep
evaluation, each leg a production CLI subprocess with wall-clock recorded.

This is the reference's full dataset-creation-and-use pipeline
(/root/reference/stylegan_code_finder/create_semantic_segmentation.py,
create_dataset_for_segmentation.py:169-206, train.py,
segmentation/evaluation/analyze_image_segments.py) executed as one measured
artifact (VERDICT r4 #5) — with the human labeller step replaced by the
appearance-scored selection of scripts/select_cluster_config.py.

    python -m synthesis_in_style_tpu.scripts.run_capstone_chain \
        <gan_checkpoint> <work_dir> --fixture <fixture_dir> \
        [--num-pairs 1024] [--ks 4 6 8 10 12] [--epochs 20] \
        [--class-weights 1 4 10] [--num-augmentations 2]

Writes <work_dir>/chain_report.json: per-leg seconds + the sweep's best
per-class dice — the committed capstone artifact's source of truth.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

import yaml


def run_leg(name: str, cmd: list, report: dict, log_dir: Path) -> None:
    print(f"=== {name}: {' '.join(map(str, cmd))}", flush=True)
    log = log_dir / f"{name}.log"
    start = time.time()
    with open(log, "w") as f:
        proc = subprocess.run([str(c) for c in cmd], stdout=f,
                              stderr=subprocess.STDOUT)
    elapsed = time.time() - start
    report["legs"][name] = {"seconds": round(elapsed, 1),
                            "returncode": proc.returncode}
    print(f"=== {name}: {elapsed:.1f}s rc={proc.returncode}", flush=True)
    if proc.returncode != 0:
        print(open(log).read()[-4000:], flush=True)
        raise SystemExit(f"{name} failed (see {log})")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("checkpoint")
    parser.add_argument("work_dir")
    parser.add_argument("--fixture", required=True,
                        help="fixture dir with eval/images + eval/gt "
                        "(scripts/make_capstone_fixture.py layout)")
    parser.add_argument("--ks", nargs="+", type=int,
                        default=[4, 6, 8, 10, 12, 14, 16])
    parser.add_argument("--num-discovery-samples", type=int, default=64)
    parser.add_argument("--num-pairs", type=int, default=1024)
    parser.add_argument("--epochs", type=int, default=20)
    parser.add_argument("--class-weights", nargs=3, type=float,
                        default=[1.0, 4.0, 10.0])
    parser.add_argument("--num-augmentations", type=int, default=2)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--seg-config",
                        default="configs/segmenter/stylegan2_doc_ufcn_segmenter.yaml")
    parser.add_argument("--select-args", default="",
                        help="extra args passed to select_cluster_config, "
                        "as ONE quoted string (shlex-split), e.g. "
                        "--select-args '--num-cd-layers 3'")
    parser.add_argument("--min-confidence", nargs="+", type=float,
                        default=[0.0, 0.5, 0.7])
    parser.add_argument("--min-contour-area", nargs="+", type=int,
                        default=[0, 55])
    parser.add_argument("--skip-discovery", action="store_true",
                        help="reuse <work_dir>/sem/catalogs from a prior run")
    args = parser.parse_args(argv)

    work = Path(args.work_dir)
    work.mkdir(parents=True, exist_ok=True)
    sem = work / "sem"
    report = {"checkpoint": str(args.checkpoint), "legs": {},
              "num_pairs": args.num_pairs}
    py = [sys.executable, "-m"]
    t0 = time.time()

    if not args.skip_discovery:
        run_leg("cluster_discovery", py + [
            "synthesis_in_style_tpu.cli.create_semantic_segmentation",
            args.checkpoint, "--destination", sem,
            "-n", args.num_discovery_samples,
            "-c", min(args.ks), max(args.ks) + 1,
        ], report, work)

    import shlex

    run_leg("select_config", py + [
        "synthesis_in_style_tpu.scripts.select_cluster_config",
        args.checkpoint, sem, "--ks", *args.ks,
        "-n", args.num_discovery_samples, "--out-tag", "sel",
    ] + shlex.split(args.select_args), report, work)

    dataset_dir = work / "dataset"
    run_leg("labelled_synthesis", py + [
        "synthesis_in_style_tpu.cli.create_dataset_for_segmentation",
        args.checkpoint, sem / "creation_config_sel.json",
        "-n", args.num_pairs, "-s", dataset_dir, "-ssd", sem,
        "--num-clusters", "sel", "-b", 16,
    ], report, work)

    # derived segmenter config: fixture-size images, the r4-measured class
    # weights, augmentation ON (appearance-coded classes survive it)
    with open(args.seg_config) as f:
        seg_config = yaml.safe_load(f)
    gan_config = json.loads(
        (Path(args.checkpoint).parent.parent / "config" / "config.json")
        .read_text()
    )
    seg_config.update({
        "epochs": args.epochs,
        "image_size": int(gan_config["image_size"]),
        "class_weights": list(args.class_weights),
        "num_augmentations": args.num_augmentations,
        "batch_size": args.batch_size,
        "snapshot_save_iter": 10_000_000,  # final snapshot only
    })
    seg_config_path = work / "seg_config.yaml"
    seg_config_path.write_text(yaml.safe_dump(seg_config))
    run_leg("segmenter_training", py + [
        "synthesis_in_style_tpu.cli.train", seg_config_path,
        "--images", dataset_dir / "train.json",
        "--val-images", dataset_dir / "val.json",
        "--class-to-color-map", "configs/handwriting_colors.json",
        "-l", work / "seg_logs", "-ln", "docufcn",
    ], report, work)

    runs = sorted((work / "seg_logs" / "docufcn").iterdir())
    ckpts = sorted((runs[-1] / "checkpoints").glob("iter_*"))
    eval_config = {
        "checkpoint": str(ckpts[-1]),
        "class_to_color_map": "configs/handwriting_colors.json",
        "max_image_size": 0,
    }
    (work / "eval_config.json").write_text(json.dumps(eval_config))
    run_leg("sweep_eval", py + [
        "synthesis_in_style_tpu.cli.analyze_image_segments",
        Path(args.fixture) / "eval" / "images",
        "-f", work / "eval_config.json",
        "-gt", Path(args.fixture) / "eval" / "gt",
        "-o", work / "eval_out", "-cds", "-cio",
        "--min-confidence", *args.min_confidence,
        "--min-contour-area", *args.min_contour_area,
        "--handle-existing", "overwrite",
    ], report, work)

    results = json.loads((work / "eval_out" / "results.json").read_text())
    best = max(
        results["runs"],
        key=lambda run: run["average_dice_scores"]["weighted_avg"]["score"],
    )
    report["total_seconds"] = round(time.time() - t0, 1)
    report["best_dice"] = {
        name: best["average_dice_scores"][name]["score"]
        for name in ("background", "printed_text", "handwritten_text",
                     "weighted_avg")
    }
    report["results_json"] = str(work / "eval_out" / "results.json")
    (work / "chain_report.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
