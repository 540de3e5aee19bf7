"""Convert the metric-backbone pretrained weights to framework-neutral npz.

Calibrated quality metrics need three ImageNet backbones the reference pulls
from torch ecosystems (SURVEY.md §2.8: torchvision VGG16/AlexNet for
LPIPS/perceptual losses, the pytorch_fid InceptionV3 for FID). This script
converts them ONCE into `$SIS_METRIC_WEIGHTS` (default: ./metric_weights)
as '/'-flattened npz pytrees; `losses.lpips.LPIPS` and `evaluation.fid.FID`
then pick them up automatically from that env var. The LPIPS lin
calibration weights are already vendored in-repo
(losses/lpips_weights/v0.{0,1}/*.npz) and need no conversion.

Sources (this image has zero egress — provide local files):
  * torchvision cache (~/.cache/torch/hub/checkpoints/vgg16-*.pth,
    alexnet-*.pth) or --vgg16/--alexnet paths
  * pytorch_fid checkpoint (pt_inception-2015-12-05-*.pth) or --inception
  * a reference-style torchvision install (`--from-torchvision` downloads
    via torchvision.models when the environment allows network access)

Usage:
    python -m synthesis_in_style_tpu.scripts.fetch_metric_weights \
        [--out DIR] [--vgg16 PTH] [--alexnet PTH] [--inception PTH]
        [--from-torchvision]
"""

from __future__ import annotations

import argparse
import glob
import os
from pathlib import Path


def _default_out() -> Path:
    return Path(os.environ.get("SIS_METRIC_WEIGHTS", "metric_weights"))


def _find_in_torch_cache(pattern: str):
    cache = Path.home() / ".cache" / "torch" / "hub" / "checkpoints"
    hits = sorted(glob.glob(str(cache / pattern)))
    return Path(hits[-1]) if hits else None


def _load_state_dict(path: Path):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in obj.items()}


def convert_vgg16(state_dict, out_dir: Path) -> Path:
    from synthesis_in_style_tpu.losses.feature_extractors import (
        load_torch_vgg16_features,
    )
    from synthesis_in_style_tpu.utils.checkpoint import save_pytree_npz

    variables = load_torch_vgg16_features(state_dict)
    path = out_dir / "vgg_features.npz"
    save_pytree_npz(path, variables)
    return path


def convert_alexnet(state_dict, out_dir: Path) -> Path:
    from synthesis_in_style_tpu.losses.feature_extractors import (
        load_torch_alexnet_features,
    )
    from synthesis_in_style_tpu.utils.checkpoint import save_pytree_npz

    variables = load_torch_alexnet_features(state_dict)
    path = out_dir / "alex_features.npz"
    save_pytree_npz(path, variables)
    return path


def convert_squeezenet(state_dict, out_dir: Path) -> Path:
    from synthesis_in_style_tpu.losses.feature_extractors import (
        load_torch_squeezenet_features,
    )
    from synthesis_in_style_tpu.utils.checkpoint import save_pytree_npz

    variables = load_torch_squeezenet_features(state_dict)
    path = out_dir / "squeeze_features.npz"
    save_pytree_npz(path, variables)
    return path


def convert_inception(state_dict, out_dir: Path) -> Path:
    from synthesis_in_style_tpu.models.inception_v3 import (
        load_torch_inception_v3,
    )
    from synthesis_in_style_tpu.utils.checkpoint import save_pytree_npz

    variables = load_torch_inception_v3(state_dict)
    path = out_dir / "inception_v3.npz"
    save_pytree_npz(path, variables)
    return path


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--out", type=Path, default=None,
                        help="output dir (default $SIS_METRIC_WEIGHTS or "
                        "./metric_weights)")
    parser.add_argument("--vgg16", type=Path, default=None)
    parser.add_argument("--alexnet", type=Path, default=None)
    parser.add_argument("--squeezenet", type=Path, default=None)
    parser.add_argument("--inception", type=Path, default=None,
                        help="pytorch_fid pt_inception .pth")
    parser.add_argument("--from-torchvision", action="store_true",
                        help="download via torchvision.models (needs "
                        "network access)")
    args = parser.parse_args(argv)

    out_dir = args.out or _default_out()
    out_dir.mkdir(parents=True, exist_ok=True)
    converted = []

    vgg = args.vgg16 or _find_in_torch_cache("vgg16-*.pth")
    alex = args.alexnet or _find_in_torch_cache("alexnet-*.pth")
    squeeze = args.squeezenet or _find_in_torch_cache("squeezenet1_1-*.pth")
    inception = args.inception or _find_in_torch_cache("pt_inception-*.pth")

    if args.from_torchvision and (vgg is None or alex is None):
        import torchvision

        if vgg is None:
            m = torchvision.models.vgg16(weights="IMAGENET1K_V1")
            converted.append(
                convert_vgg16(
                    {k: v.numpy() for k, v in m.state_dict().items()}, out_dir
                )
            )
        if alex is None:
            m = torchvision.models.alexnet(weights="IMAGENET1K_V1")
            converted.append(
                convert_alexnet(
                    {k: v.numpy() for k, v in m.state_dict().items()}, out_dir
                )
            )
    if vgg is not None:
        converted.append(convert_vgg16(_load_state_dict(vgg), out_dir))
    if alex is not None:
        converted.append(convert_alexnet(_load_state_dict(alex), out_dir))
    if squeeze is not None:
        converted.append(
            convert_squeezenet(_load_state_dict(squeeze), out_dir)
        )
    if inception is not None:
        converted.append(
            convert_inception(_load_state_dict(inception), out_dir)
        )

    if not converted:
        print(
            "no source weights found — pass --vgg16/--alexnet/--inception "
            "paths (or --from-torchvision with network access)"
        )
        return 1
    for p in converted:
        print("wrote", p)
    print(f"export SIS_METRIC_WEIGHTS={out_dir.resolve()}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
