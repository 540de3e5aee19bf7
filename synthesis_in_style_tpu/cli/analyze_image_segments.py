"""Patch-based inference + hyperparameter sweep + metric evaluation CLI.

Capability parity with the reference
(/root/reference/stylegan_code_finder/segmentation/evaluation/analyze_image_segments.py:25-287):
same flags, same hyperparameter grid (min_confidence x min_contour_area x
patch overlap), same results.json structure with per-image confusion
matrices, per-image and global metric scores, and the
abort/append/overwrite resume protocol; visualization output (color
segmentation, optional confidence shading, overlay, patch grid, bbox
extraction and crops).

Usage:
  python -m synthesis_in_style_tpu.cli.analyze_image_segments <image_dir> \
      -f eval_config.json -gt gt_dir -cds -cio --min-confidence 0.5 0.7
"""

from __future__ import annotations

import argparse
import itertools
import json
import re
from collections import defaultdict
from pathlib import Path
from typing import Dict, Optional

import numpy as np
from PIL import Image, UnidentifiedImageError

from synthesis_in_style_tpu.data.json_dataset import is_image
from synthesis_in_style_tpu.utils.image_utils import resize_image
from synthesis_in_style_tpu.evaluation.metrics import (
    calculate_confusion_matrix,
    calculate_metric,
)
from synthesis_in_style_tpu.segmentation.analysis_segmenter import (
    VotingAssemblySegmenter,
)
from synthesis_in_style_tpu.utils.segmentation_utils import (
    segmentation_image_to_class_image,
)
from synthesis_in_style_tpu.visualization.utils import (
    network_output_to_color_image,
)


def create_hyperparam_configs(args) -> tuple:
    """(reference create_hyperparam_configs :128-136)."""
    overlap = list(
        itertools.product(args.absolute_patch_overlap, args.patch_overlap_factor)
    )
    combos = list(
        itertools.product(args.min_confidence, args.min_contour_area, overlap)
    )
    names = ("min_confidence", "min_contour_area", "patch_overlap")
    return tuple({k: v for k, v in zip(names, combo)} for combo in combos)


def prepare_results(handle_existing: str, output_json_path: Path,
                    model_config: dict, segmenter_config: dict,
                    class_to_color_map: dict) -> dict:
    """(reference prepare_results :138-164)."""
    if output_json_path.exists() and handle_existing != "overwrite":
        assert handle_existing != "abort", (
            f"{output_json_path} already exists and --handle-existing is set "
            "to 'abort'"
        )
        with open(output_json_path) as old_json:
            results = json.load(old_json)
        assert results["general_config"]["experiment_config"] == model_config, (
            "The previously saved experiment config does not match the "
            "current one. Use a new output dir instead of setting "
            "--handle-existing to append."
        )
        return results
    return {
        "general_config": {
            "experiment_config": model_config,
            "model_config": {
                k: v for k, v in segmenter_config.items()
                if isinstance(v, (str, int, float, bool, list, dict, type(None)))
            },
            "class_to_color_map": class_to_color_map,
        },
        "runs": [],
    }


def get_string_representation_of_config(hyperparam_config: Dict) -> str:
    """(reference :179-184)."""
    return "_".join(
        re.sub(r"[,\s.]", "_", re.sub(r"[()]", "", f"{k}_{v}"))
        for k, v in hyperparam_config.items()
    )


def load_ground_truth_classes(image_path: Path, ground_truth_dir: Path,
                              class_to_color_map: dict) -> np.ndarray:
    """(reference get_ground_truth_class_map_for_image,
    segmentation_metric_calculation.py:15-22): <stem>_gt.png color mask."""
    gt_path = Path(ground_truth_dir) / f"{image_path.stem}_gt.png"
    assert gt_path.exists(), (
        f"The following ground truth image does not exist: {gt_path}. "
        "Is it a png?"
    )
    gt = np.asarray(Image.open(gt_path).convert("RGB"))
    return segmentation_image_to_class_image(gt, class_to_color_map)


def visualize_segmentation(assembled_prediction: np.ndarray,
                           image: Image.Image, segmenter, args,
                           class_to_color_map: dict, image_prefix: str) -> None:
    """Color render (+confidence shading), optional overlay / patch grid /
    bbox drawing and crops (reference segmentation_visualization.py:22-145,
    condensed)."""
    import cv2

    colored = network_output_to_color_image(
        assembled_prediction[None], class_to_color_map,
        show_confidence_in_segmentation=args.show_confidence,
    )[0]

    out_dir = Path(args.output_dir)
    base = np.asarray(image.convert("RGB"))

    if args.overlay_segmentation:
        overlay = (0.5 * base + 0.5 * colored).astype(np.uint8)
        Image.fromarray(overlay).save(out_dir / f"{image_prefix}_overlay.png")

    render = colored.copy()
    if args.draw_patches:
        for bbox in segmenter.calculate_bboxes_for_patches(*image.size):
            cv2.rectangle(render, (bbox.left, bbox.top),
                          (min(bbox.right, render.shape[1] - 1),
                           min(bbox.bottom, render.shape[0] - 1)),
                          (128, 128, 128), 1)

    if args.extract_bboxes or args.save_bboxes or args.save_contours:
        predicted = np.argmax(assembled_prediction, axis=-1).astype(np.uint8)
        annotated = base.copy()
        box_id = 0
        for class_id in range(1, assembled_prediction.shape[-1]):
            mask = (predicted == class_id).astype(np.uint8)
            contours, _ = cv2.findContours(
                mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
            )
            for contour in contours:
                x, y, w, h = cv2.boundingRect(contour)
                cv2.rectangle(annotated, (x, y), (x + w, y + h), (255, 0, 0), 1)
                if args.draw_bboxes_on_segmentation:
                    cv2.rectangle(render, (x, y), (x + w, y + h), (255, 0, 0), 1)
                if args.save_bboxes:
                    Image.fromarray(base[y : y + h, x : x + w]).save(
                        out_dir / f"{image_prefix}_bbox_{box_id:04d}.png"
                    )
                if args.save_contours:
                    crop_mask = np.zeros(mask.shape, np.uint8)
                    cv2.drawContours(crop_mask, [contour], 0, 1, cv2.FILLED)
                    crop = base * crop_mask[:, :, None]
                    Image.fromarray(crop[y : y + h, x : x + w]).save(
                        out_dir / f"{image_prefix}_contour_{box_id:04d}.png"
                    )
                box_id += 1
        Image.fromarray(annotated).save(out_dir / f"{image_prefix}_bboxes.png")

    Image.fromarray(render).save(out_dir / f"{image_prefix}_segmentation.png")




def main(args: argparse.Namespace) -> None:
    with open(args.config_file) as f:
        model_config = json.load(f)
    segmenter = VotingAssemblySegmenter(
        model_config["checkpoint"],
        class_to_color_map=model_config["class_to_color_map"],
        original_config_path=args.original_config_path,
        max_image_size=int(model_config.get("max_image_size", 0)) or None,
        print_progress=False,
        show_confidence_in_segmentation=args.show_confidence,
        use_device_component_filter=(
            args.use_device_component_filter
            or bool(model_config.get("use_device_component_filter", False))
        ),
        fused_page_inference=(
            args.fused_page_inference
            or bool(model_config.get("fused_page_inference", False))
        ),
        quantized=(
            args.quantize or bool(model_config.get("quantize", False))
        ),
        serving_dtype=(
            args.serving_dtype or model_config.get("serving_dtype")
        ),
    )
    class_to_color_map = segmenter.class_to_color_map
    class_names = list(class_to_color_map.keys())
    num_classes = segmenter.config.get("num_classes", len(class_to_color_map))
    assert len(class_to_color_map) == num_classes, (
        "Number of classes in color map and segmenter differs."
    )

    hyperparam_configs = create_hyperparam_configs(args)
    args.output_dir.mkdir(parents=True, exist_ok=True)
    output_json_path = args.output_dir / "results.json"

    scores_to_calculate = {
        "dice": args.calculate_dice_score,
        "iou": args.calculate_iou,
        "precision": args.calculate_precision,
        "recall": args.calculate_recall,
    }
    evaluate = any(scores_to_calculate.values())
    if evaluate:
        results = prepare_results(
            args.handle_existing, output_json_path, model_config,
            segmenter.config, class_to_color_map,
        )
    else:
        print("No metrics specified, no evaluation will be run")

    image_paths = [f for f in args.image_dir.glob("**/*") if is_image(f)]
    assert len(image_paths) > 0, "There are no images in the given directory."

    pages_per_batch = args.pages_per_batch or int(
        model_config.get("pages_per_batch", 0)
    )

    def load_one(image_path: Path) -> Optional[Image.Image]:
        try:
            image = Image.open(image_path)
        except UnidentifiedImageError:
            print(f"File {image_path} is not an image.")
            return None
        if args.resize:
            image = resize_image(image, args.resize)
        if args.convert_to_black_white:
            image = image.convert("L")
        return image

    for hyperparam_config in hyperparam_configs:
        segmenter.set_hyperparams(hyperparam_config)
        if evaluate:
            results["runs"].append(defaultdict(dict))
        global_confusion_matrix = np.zeros((num_classes, num_classes))

        def evaluate_one(image_path: Path, predicted: np.ndarray) -> None:
            try:
                gt = load_ground_truth_classes(
                    image_path, args.ground_truth_dir, class_to_color_map
                )
                assert predicted.shape == gt.shape, (
                    "Shapes of prediction and ground truth do not match"
                )
                cm = calculate_confusion_matrix(gt, predicted, num_classes)
                results["runs"][-1]["confusion_matrices"][image_path.stem] = [
                    float(v) for v in cm.reshape(-1)
                ]
                global_confusion_matrix[...] += cm
                for metric, do_calc in scores_to_calculate.items():
                    if do_calc:
                        results["runs"][-1][f"detailed_{metric}_scores"][
                            image_path.stem
                        ] = calculate_metric(cm, class_names, metric)
            except Exception as e:  # noqa: BLE001 — parity (ref :247-272)
                print(
                    f"The confusion matrix calculation produced an error:\n"
                    f"'{e}'\nThe calculation for {image_path} will be "
                    "skipped.\n"
                )

        if (
            pages_per_batch > 1
            and not args.visualize_segmentation
            and segmenter.fused_page_inference
        ):
            # Throughput mode: same-tiling pages grouped into one fused
            # dispatch each, device-argmaxed uint8 fetch. Loading happens
            # per chunk so host memory stays bounded for large image dirs.
            chunk_size = 4 * pages_per_batch
            for start in range(0, len(image_paths), chunk_size):
                chunk = [
                    (p, im)
                    for p in image_paths[start : start + chunk_size]
                    for im in (load_one(p),)
                    if im is not None
                ]
                if not chunk:
                    continue
                bq = getattr(args, "bucket_quantum", 0)
                predictions = segmenter.segment_images(
                    [im for _, im in chunk], pages_per_batch,
                    output="classes",
                    bucket_quantum=None if bq < 0 else bq,
                )
                if evaluate:
                    for (image_path, _), predicted in zip(chunk, predictions):
                        evaluate_one(image_path, predicted)
            if evaluate:
                _finalize_run(
                    results, global_confusion_matrix, scores_to_calculate,
                    class_names, hyperparam_config, output_json_path,
                )
            continue

        for image_path in image_paths:
            image = load_one(image_path)
            if image is None:
                continue

            if args.visualize_segmentation:
                assembled_prediction = segmenter.segment_image(image)
                predicted = np.argmax(assembled_prediction, axis=-1)
            else:
                # Evaluation only needs class ids: fetch the device-argmaxed
                # uint8 canvas (num_classes*4x fewer device→host bytes on
                # the fused path; identical argmax semantics).
                assembled_prediction = None
                predicted = segmenter.segment_image_classes(image)

            if evaluate:
                evaluate_one(image_path, predicted)

            if args.visualize_segmentation:
                prefix = (
                    f"{image_path.stem}_"
                    f"{get_string_representation_of_config(hyperparam_config)}"
                )
                try:
                    visualize_segmentation(
                        assembled_prediction, image, segmenter, args,
                        class_to_color_map, prefix,
                    )
                except Exception as e:  # noqa: BLE001
                    print(
                        f"The visualization produced an error:\n'{e}'\n"
                        f"The visualization for {image_path} will be skipped.\n"
                    )

        if evaluate:
            _finalize_run(
                results, global_confusion_matrix, scores_to_calculate,
                class_names, hyperparam_config, output_json_path,
            )


def _finalize_run(results, global_confusion_matrix, scores_to_calculate,
                  class_names, hyperparam_config, output_json_path) -> None:
    """Per-hyperparam-config result aggregation + incremental results.json
    dump (reference :257-282)."""
    for metric, do_calc in scores_to_calculate.items():
        if do_calc:
            results["runs"][-1][f"average_{metric}_scores"] = calculate_metric(
                global_confusion_matrix, class_names, metric
            )
    results["runs"][-1]["hyperparams"] = hyperparam_config
    with open(output_json_path, "w") as out_json:
        json.dump(results, out_json, indent=4)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="Analyze the given images using the specified "
        "segmentation model.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    parser.add_argument("image_dir", type=Path)
    parser.add_argument("-cds", "--calculate-dice-score", action="store_true",
                        default=False)
    parser.add_argument("-cio", "--calculate-iou", action="store_true",
                        default=False)
    parser.add_argument("-cpr", "--calculate-precision", action="store_true",
                        default=False)
    parser.add_argument("-cre", "--calculate-recall", action="store_true",
                        default=False)
    parser.add_argument("-vis", "--visualize-segmentation", action="store_true",
                        default=False)
    parser.add_argument("-f", "--config-file", default="config.json", type=Path)
    parser.add_argument("-op", "--original-config-path", type=Path, default=None)
    parser.add_argument("-gt", "--ground-truth-dir", type=Path, default=None)
    parser.add_argument("-o", "--output-dir", default="images", type=Path)
    parser.add_argument("--handle-existing", default="abort",
                        choices=["abort", "append", "overwrite"])
    parser.add_argument("--resize", nargs=2, type=int, default=None)
    parser.add_argument("-bw", "--convert-to-black-white", action="store_true",
                        default=False)
    parser.add_argument("--absolute-patch-overlap", nargs="+", type=int,
                        default=[0])
    parser.add_argument("--patch-overlap-factor", nargs="+", type=float,
                        default=[0.0])
    parser.add_argument("--min-confidence", nargs="+", type=float, default=[0.7])
    parser.add_argument("--min-contour-area", nargs="+", type=int, default=[55])
    parser.add_argument("--extract-bboxes", action="store_true", default=False)
    parser.add_argument("--draw-patches", action="store_true", default=False)
    parser.add_argument("--draw-bboxes-on-segmentation", action="store_true",
                        default=False)
    parser.add_argument("-b", "--save-bboxes", action="store_true", default=False)
    parser.add_argument("-c", "--save-contours", action="store_true",
                        default=False)
    parser.add_argument("--show-confidence", action="store_true", default=False)
    parser.add_argument("--overlay-segmentation", action="store_true",
                        default=False)
    parser.add_argument("--use-device-component-filter", action="store_true",
                        default=False,
                        help="Run the small-component postprocess on device "
                        "(segmentation/device_cc.py) instead of host cv2 "
                        "contours. Pixel-area semantics.")
    parser.add_argument("--fused-page-inference", action="store_true",
                        default=False,
                        help="Run each page as ONE jitted program (patch "
                        "extraction + forward + device component filter + "
                        "voting assembly on device). Implies the device "
                        "component filter.")
    parser.add_argument("--pages-per-batch", type=int, default=0,
                        help="Throughput mode (requires fused page "
                        "inference; evaluation only, ignored with -vis): "
                        "group N pages into one fused dispatch "
                        "with device-argmaxed uint8 class output. Pages of "
                        "different sizes batch together (canvas bucketing; "
                        "see --bucket-quantum).")
    parser.add_argument("--bucket-quantum", type=int, default=0,
                        help="Canvas-size quantum (px) for batching pages "
                        "of DIFFERENT sizes into one compiled program; 0 = "
                        "the patch size (default), negative = disable "
                        "bucketing (exact-tiling groups only). Results are "
                        "bit-equal to each page's own tiling either way.")
    parser.add_argument("--quantize", action="store_true", default=False,
                        help="Static w8a8 int8 serving for the patch "
                        "forward (DocUFCN only): scales calibrated on the "
                        "first page, int8 tensors between layers — see "
                        "models/doc_ufcn_quant.py. Also enabled by "
                        "'quantize: true' in the config file.")
    parser.add_argument("--serving-dtype", default=None,
                        choices=["float32", "bfloat16"],
                        help="Compute dtype for the patch forward "
                        "(default float32; bfloat16 is ~13%% faster on "
                        "v5e at 99.8%% argmax agreement). Also settable "
                        "via 'serving_dtype' in the config file. Mutually "
                        "exclusive with --quantize.")
    return parser


def parse_and_check_arguments():
    args = build_parser().parse_args()
    assert args.calculate_dice_score or args.visualize_segmentation, (
        "Setting neither --calculate-dice-score nor --visualize-segmentation "
        "will result in no output."
    )
    if args.calculate_dice_score:
        assert args.ground_truth_dir is not None, (
            "If --calculate-dice-score is set --ground-truth-dir has to be "
            "set as well."
        )
    return args


if __name__ == "__main__":
    print("Starting execution")
    main(parse_and_check_arguments())
