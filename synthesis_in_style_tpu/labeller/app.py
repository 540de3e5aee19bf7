"""Semantic class labeller — the human-in-the-loop web tool that assigns
semantic classes to discovered clusters.

Capability parity with the reference Flask app
(/root/reference/semantic_labeller/app.py:43-249): same routes (`/`,
`/image/<id>/<sub>`, `/original-image/<id>/<sub>`, POST `/label/<id>/<sub>`,
POST `/save`), same artifacts (reads `cluster_labels/<k>.npz` +
`cluster_arrays/<k>.npz` produced by cli/create_semantic_segmentation;
writes `merged_classes_<k>.json` keyed by layer id, consumed by
segmentation.dataset_segmenter.load_class_label_map).

Flask is not available in this image, so the server is a stdlib
http.server ThreadingHTTPServer with a self-contained single-page UI
(templates/base.html — original, not ported).

Run:
  python -m synthesis_in_style_tpu.labeller.app --base-dir <semantic_segmentation
  dir> --num-clusters 17 --class-colors colors.json [--port 5000]
"""

from __future__ import annotations

import argparse
import copy
import json
import re
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from io import BytesIO
from pathlib import Path
from typing import Dict, List

import numpy as np
from PIL import Image, ImageColor

# distinct cluster colors (reference COLOR_MAP, semantic_labeller/app.py:13-41)
COLOR_MAP = [
    "#00B3FF", "#753E80", "#0068FF", "#D7BDA6", "#2000C1", "#62A2CE",
    "#667081", "#347D00", "#8E76F6", "#8A5300", "#5C7AFF", "#7A3753",
    "#008EFF", "#5128B3", "#00C8F4", "#0D187F", "#00AA93", "#153359",
    "#133AF1", "#162C23",
]


class Labeller:
    """Reference Labeller (app.py:43-198): holds per-layer cluster-label
    arrays, a cluster→display-color map, and the mutable cluster→class
    assignment that `/save` writes out."""

    def __init__(self, base_dir: Path, num_clusters: int, class_colors: Path,
                 max_size: int = 256):
        self.base_dir = Path(base_dir)
        self.num_clusters = num_clusters
        self.arrays = self._load_color_arrays()
        self.labels, self.layer_ids = self._load_label_arrays()
        self.class_colors = self._load_class_colors(class_colors)
        self.color_map = copy.copy(COLOR_MAP)
        self._adjust_color_map()
        self.color_map.extend(self.class_colors.values())
        self.label_map = self._create_label_map()
        self.max_size = max_size

    # ---------------- artifact loading ----------------

    def _load_color_arrays(self) -> List[np.ndarray]:
        npz = np.load(
            str(self.base_dir / "cluster_arrays" / f"{self.num_clusters}.npz")
        )
        return [npz[name] for name in npz.files]  # NCHW uint8

    def _load_label_arrays(self):
        path = self.base_dir / "cluster_labels" / f"{self.num_clusters}.npz"
        if path.exists():
            npz = np.load(str(path))
            layer_ids = list(npz.files)
            return [npz[name] for name in layer_ids], layer_ids
        legacy = self.base_dir / "catalogs" / f"{self.num_clusters}.pkl"
        if legacy.exists():
            return self._load_legacy_label_arrays(legacy)
        raise FileNotFoundError(
            f"neither {path} nor {legacy} exists — run "
            "cli/create_semantic_segmentation first (or point --base-dir at "
            "a reference-era semantic_segmentation directory)"
        )

    def _load_legacy_label_arrays(self, pkl_path: Path):
        """Reference-era artifacts: per-layer pickled estimators whose
        `labels_` reshape to (N, H, W) of the matching cluster array
        (reference semantic_labeller/app.py:99-119)."""
        from synthesis_in_style_tpu.segmentation.factor_catalog import (
            load_legacy_pickle,
        )

        catalogs = load_legacy_pickle(pkl_path)
        catalogs.pop("id_to_size_map", None)
        layer_ids = [str(k) for k in catalogs.keys()]
        labels = []
        for (layer_id, catalog), array in zip(catalogs.items(), self.arrays):
            est = getattr(catalog, "_factorization", catalog)
            n, _, h, w = array.shape
            labels.append(
                np.asarray(est.labels_).reshape(n, h, w).astype(np.int32)
            )
        return labels, layer_ids

    @staticmethod
    def _load_class_colors(class_colors: Path) -> dict:
        with Path(class_colors).open() as f:
            return json.load(f)

    def _adjust_color_map(self):
        if len(self.color_map) < self.num_clusters:
            for i in range(self.num_clusters - len(self.color_map)):
                self.color_map.append(self.color_map[i % len(self.color_map)])

    @property
    def default_result_file_name(self) -> str:
        return f"merged_classes_{self.num_clusters}.json"

    def _create_label_map(self) -> List[Dict[int, int]]:
        """Resume an existing merged_classes json or start with identity
        (reference :57-77)."""
        default_path = self.base_dir / self.default_result_file_name
        if default_path.exists():
            with default_path.open() as f:
                label_map = json.load(f)
            result = []
            base = len(self.color_map) - len(self.class_colors)
            for sub_label_map in label_map.values():
                new_map = {}
                for key, value in sub_label_map.items():
                    if value in self.class_colors:
                        value = list(self.class_colors.keys()).index(value) + base
                    new_map[int(key)] = int(value)
                result.append(new_map)
            return result
        return [
            {i: i for i in range(len(self.color_map))}
            for _ in range(len(self.labels))
        ]

    # ---------------- rendering ----------------

    @property
    def num_images(self) -> int:
        return self.arrays[0].shape[0]

    @property
    def image_size(self) -> int:
        largest = max(arr.shape[-1] for arr in self.arrays)
        return min(largest, self.max_size)

    def get_color(self, cluster_id: int, sub_image_id: int):
        mapped = self.label_map[sub_image_id][cluster_id]
        return ImageColor.getrgb(self.color_map[mapped % len(self.color_map)])

    def class_color_range(self) -> Dict[int, str]:
        base = len(self.color_map) - len(self.class_colors)
        return {
            base + i: color for i, color in enumerate(self.class_colors.values())
        }

    def get_image(self, image_id: int, sub_image_id: int,
                  original: bool = False) -> Image.Image:
        if original:
            data = self.arrays[sub_image_id][image_id]  # (3, H, W)
            img = Image.fromarray(data.astype(np.uint8).transpose(1, 2, 0))
        else:
            labels = self.labels[sub_image_id][image_id % self.num_images]
            lut = np.zeros((self.num_clusters, 3), np.uint8)
            for i in range(self.num_clusters):
                lut[i] = self.get_color(i, sub_image_id)
            img = Image.fromarray(lut[labels])
        size = self.image_size
        return img.resize((size, size), Image.NEAREST)

    # ---------------- labelling ----------------

    def adjust_label(self, image_id: int, sub_image_id: int,
                     adjustment_data: dict) -> None:
        """(reference :179-190): look up the cluster under the click and remap
        it to the chosen class color index (or reset)."""
        labels = self.labels[sub_image_id][image_id % self.num_images]
        h, w = labels.shape[-2:]
        x = int(adjustment_data["position"]["x"] / self.image_size * w)
        y = int(adjustment_data["position"]["y"] / self.image_size * h)
        original_label = int(labels[y, x])
        if adjustment_data["mode"] == "reset":
            self.label_map[sub_image_id][original_label] = original_label
        else:
            self.label_map[sub_image_id][original_label] = int(
                adjustment_data["color"]
            )

    def save(self, data: dict) -> Path:
        """Write merged_classes_<k>.json keyed by layer id with class NAMES
        for class-assigned clusters (reference :137-154)."""
        file_name = Path(data.get("file_name") or self.default_result_file_name)
        base = len(self.color_map) - len(self.class_colors)
        adjusted = []
        for sub_label_map in self.label_map:
            labels = {}
            for key, value in sub_label_map.items():
                if value >= base:
                    value = list(self.class_colors.keys())[value - base]
                labels[key] = value
            adjusted.append(labels)
        to_save = {
            layer_id: labels for layer_id, labels in zip(self.layer_ids, adjusted)
        }
        out = self.base_dir / file_name.name
        with out.open("w") as f:
            json.dump(to_save, f, indent="\t")
        return out


def render_index(labeller: Labeller) -> str:
    template = (Path(__file__).parent / "templates" / "base.html").read_text()
    palette = "".join(
        f'<button class="color" data-color="{idx}" '
        f'style="background:{color}" title="{name}"></button>'
        for (idx, color), name in zip(
            labeller.class_color_range().items(), labeller.class_colors.keys()
        )
    )
    return (
        template.replace("__NUM_SUB_IMAGES__", str(len(labeller.labels)))
        .replace("__NUM_IMAGES__", str(labeller.num_images))
        .replace("__IMAGE_SIZE__", str(labeller.image_size))
        .replace("__PALETTE__", palette)
        .replace("__LAYER_IDS__", json.dumps(labeller.layer_ids))
    )


def make_handler(labeller: Labeller):
    image_re = re.compile(r"^/(image|original-image)/(\d+)/(\d+)$")
    label_re = re.compile(r"^/label/(\d+)/(\d+)$")

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):
            pass

        def _send(self, body: bytes, content_type: str, status: int = 200):
            self.send_response(status)
            self.send_header("Content-Type", content_type)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Cache-Control", "no-cache")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            # strip the query string — the UI appends a ?t=<now> cache-buster
            # to every image URL
            path = self.path.split("?", 1)[0]
            if path == "/":
                self._send(render_index(labeller).encode(), "text/html")
                return
            m = image_re.match(path)
            if m:
                kind, image_id, sub_image_id = m.groups()
                img = labeller.get_image(
                    int(image_id), int(sub_image_id),
                    original=(kind == "original-image"),
                )
                buf = BytesIO()
                img.save(buf, "PNG")
                self._send(buf.getvalue(), "image/png")
                return
            self._send(b"not found", "text/plain", 404)

        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            data = json.loads(self.rfile.read(length) or b"{}")
            m = label_re.match(self.path.split("?", 1)[0])
            if m:
                image_id, sub_image_id = map(int, m.groups())
                labeller.adjust_label(image_id, sub_image_id, data)
                self._send(
                    json.dumps({"sub_image_id": sub_image_id}).encode(),
                    "application/json",
                )
                return
            if self.path == "/save":
                labeller.save(data)
                self._send(b"", "text/plain")
                return
            self._send(b"not found", "text/plain", 404)

    return Handler


def main():
    parser = argparse.ArgumentParser(description="Semantic class labeller")
    parser.add_argument("--base-dir", type=Path, required=True)
    parser.add_argument("--num-clusters", type=int, required=True)
    parser.add_argument("--class-colors", type=Path, required=True)
    parser.add_argument("--port", type=int, default=5000)
    parser.add_argument("--host", default="127.0.0.1")
    args = parser.parse_args()

    labeller = Labeller(args.base_dir, args.num_clusters, args.class_colors)
    server = ThreadingHTTPServer((args.host, args.port), make_handler(labeller))
    print(f"labeller listening on http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
