"""Patch-based whole-page inference: tile, predict, re-assemble.

Capability parity with the reference
(/root/reference/stylegan_code_finder/segmentation/analysis_segmenter.py):
`AnalysisSegmenter` (max assembly, :144-164) and `VotingAssemblySegmenter`
(summed-confidence voting normalized to [0,1], :198-223), same patch-tiling
semantics (`calculate_bboxes_for_patches` :83-112: explicit overlap OR
automatic even-overlap), same hyperparameter injection (:52-58).

TPU-first:
* All patches of an image are predicted in fixed-size batches through ONE
  jitted forward (static patch shape -> one compiled program regardless of
  page size); softmax + confidence threshold stay on device
  (models.base_segmenter.predict_probabilities), only the contour-area
  postprocess crosses to the host.
* The network is rebuilt from the checkpoint-relative config and an orbax
  snapshot (reference rebuilds via training builders + torch load,
  :72-81).
"""

from __future__ import annotations

import json
import math
from pathlib import Path
from typing import Dict, Iterator, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from synthesis_in_style_tpu.core.config import load_config_from_checkpoint
from synthesis_in_style_tpu.models.base_segmenter import (
    SegmenterConfig,
    predict_probabilities,
    remove_too_small_contours,
)
from synthesis_in_style_tpu.utils.segmentation_utils import BBox


def calculate_bboxes_for_patches(
    image_width: int,
    image_height: int,
    patch_size: int,
    patch_overlap: Optional[int] = None,
) -> Tuple[BBox, ...]:
    """Tile an image into patch bboxes (reference :83-112). With
    patch_overlap=None, the overlap is computed automatically so the patches
    exactly cover the image with even overlap."""
    patches: List[BBox] = []
    if patch_overlap is not None:
        current_x, current_y = 0, 0
        while current_y < image_height:
            while current_x < image_width:
                patches.append(
                    BBox(current_x, current_y, current_x + patch_size,
                         current_y + patch_size)
                )
                current_x += patch_size - patch_overlap
            current_x = 0
            current_y += patch_size - patch_overlap
    else:
        windows_in_width = math.ceil(image_width / patch_size)
        total_width_overlap = windows_in_width * patch_size - image_width
        windows_in_height = math.ceil(image_height / patch_size)
        total_height_overlap = windows_in_height * patch_size - image_height
        width_overlap_per_patch = total_width_overlap // windows_in_width
        height_overlap_per_patch = total_height_overlap // windows_in_height
        for y_idx in range(windows_in_height):
            start_y = int(y_idx * (patch_size - height_overlap_per_patch))
            for x_idx in range(windows_in_width):
                start_x = int(x_idx * (patch_size - width_overlap_per_patch))
                patches.append(
                    BBox(start_x, start_y, start_x + patch_size,
                         start_y + patch_size)
                )
    return tuple(patches)


def resolve_patch_overlap(
    patch_size: int, patch_overlap: int = 0, patch_overlap_factor: float = 0.0
) -> Optional[int]:
    """Reference set_patch_overlap (:38-50): explicit px XOR factor XOR
    automatic (None)."""
    assert patch_overlap == 0 or patch_overlap_factor == 0.0, (
        "Only one of 'patch_overlap' and 'patch_overlap_factor' should be "
        "specified"
    )
    if patch_overlap != 0:
        assert 0 < patch_overlap < patch_size, (
            f"The value of 'patch_overlap' should be in the following range: "
            f"0 < patch_overlap < patch_size ({patch_size} px)"
        )
        return patch_overlap
    if patch_overlap_factor != 0.0:
        assert 0.0 < patch_overlap_factor < 1.0, (
            "The value of 'patch_overlap_factor' should be in the following "
            "range: 0.0 < patch_overlap_factor < 1.0"
        )
        return math.ceil(patch_overlap_factor * patch_size)
    return None


class AnalysisSegmenter:
    """Max-assembly patch inference (reference AnalysisSegmenter :19-195)."""

    def __init__(
        self,
        model_checkpoint: Union[str, Path, None],
        class_to_color_map: Union[str, Path, Dict],
        original_config_path: Optional[Path] = None,
        batch_size: Optional[int] = None,
        max_image_size: Optional[int] = None,
        print_progress: bool = True,
        patch_overlap: int = 0,
        patch_overlap_factor: float = 0.0,
        show_confidence_in_segmentation: bool = False,
        network=None,
        network_variables=None,
        config: Optional[dict] = None,
        segmenter_config: Optional[SegmenterConfig] = None,
        use_device_component_filter: bool = False,
        fused_page_inference: bool = False,
        mesh=None,
        quantized: bool = False,
        serving_dtype: Optional[str] = None,
    ):
        if config is None:
            config = load_config_from_checkpoint(model_checkpoint, original_config_path)
            config["fine_tune"] = str(model_checkpoint)
        self.config = config
        self.class_to_color_map = self.load_color_map(class_to_color_map)
        self.batch_size = batch_size or self.config.get("batch_size", 1)
        self.patch_size = int(self.config["image_size"])
        self.print_progress = print_progress
        self.max_image_size = max_image_size
        self.show_confidence_in_segmentation = show_confidence_in_segmentation

        if network is None:
            network, network_variables, segmenter_config = self._load_network(
                model_checkpoint
            )
        self.network = network
        self.network_variables = network_variables
        self.segmenter_config = segmenter_config or SegmenterConfig(
            num_classes=len(self.class_to_color_map)
        )

        self.patch_overlap = resolve_patch_overlap(
            self.patch_size, patch_overlap, patch_overlap_factor
        )
        # Optional TPU fast path: replace the host cv2 small-contour filter
        # with device connected components (segmentation/device_cc.py) inside
        # the jitted predict. Pixel-area semantics (vs cv2 polygon area) —
        # thresholds are tuned per metric via the sweep CLI either way.
        self.use_device_component_filter = use_device_component_filter
        # Optional TPU fast path: run the WHOLE page — patch extraction,
        # forward, per-patch component filter, and vote/max assembly — as
        # ONE jitted program per page tiling (see _get_fused_page_fn).
        # Because there is no per-patch host stage in this mode, the
        # cv2 contour-area filter is replaced by the device component
        # filter whenever min_contour_area > 0.
        self.fused_page_inference = fused_page_inference
        # Optional multi-chip serving: a 1-D ("data",) jax.sharding.Mesh.
        # `segment_images` shards its page axis over the mesh — pages are
        # embarrassingly parallel (each device runs the fused page program
        # on its own pages, zero collectives), so throughput scales
        # ~linearly with chips. pages_per_batch must divide by the mesh
        # size; params/thresholds are replicated.
        self.mesh = mesh
        # Optional TPU fast path: static w8a8 PTQ serving
        # (models/doc_ufcn_quant.py) — int8 tensors flow between the
        # DocUFCN layers. Scales are calibrated lazily on the first page's
        # patches; fidelity gates in tests/test_quantized_docufcn.py.
        # Measured on v5e: +7% over f32 at 256px b8 — the DocUFCN convs are
        # SHAPE-limited (32-64 channels padded to the 128-lane MXU), not
        # byte-limited, so narrower tensors barely move the needle. Kept as
        # an opt-in with honest numbers; `serving_dtype="bfloat16"` below
        # is the simpler and slightly faster production choice.
        self.quantized = quantized
        self._quant_calibrated = not quantized
        # Optional serving compute dtype: "bfloat16" casts the float
        # params/batch_stats once here and runs the patch forward in bf16
        # (logits return to f32 before softmax). Measured +13% over f32 at
        # 256px b8 with 99.8% argmax agreement (same shape-limited ceiling
        # as above). Mutually exclusive with `quantized` — the w8a8 path
        # calibrates against the float master weights.
        if serving_dtype is not None and str(serving_dtype) not in (
            "float32", "f32",
        ):
            if quantized:
                raise ValueError(
                    "serving_dtype and quantized are mutually exclusive"
                )
            from synthesis_in_style_tpu.utils.precision import cast_floating

            self.serving_dtype = jnp.dtype(serving_dtype)
            self.network_variables = cast_floating(
                self.network_variables, self.serving_dtype
            )
        else:
            self.serving_dtype = None
        # Compiled-program caches. min_confidence / min_contour_area are
        # TRACED arguments of these programs, so set_hyperparams sweeps
        # (cli/analyze_image_segments.py) reuse one compiled program across
        # configs; only the structural 0 <-> >0 transition of the area
        # filter (and, for the fused path, the page tiling) keys a variant.
        self._predict_fns: Dict[tuple, object] = {}
        self._fused_fns: Dict[tuple, object] = {}
        self._fused_pages_fns: Dict[tuple, object] = {}

    # ---------------- configuration ----------------

    def load_color_map(self, color_map: Union[str, Path, Dict]) -> dict:
        if isinstance(color_map, dict):
            return color_map
        with Path(color_map).open() as f:
            return json.load(f)

    def _load_network(self, model_checkpoint):
        from synthesis_in_style_tpu.training_builder import (
            get_train_builder_class,
        )

        config = dict(self.config)
        if config.get("network") == "base":  # legacy configs
            config["network"] = "DocUFCN"
        builder = get_train_builder_class(config)(config)
        return builder.get_network_for_inference(model_checkpoint)

    def set_patch_overlap(self, patch_overlap: int, patch_overlap_factor: float):
        self.patch_overlap = resolve_patch_overlap(
            self.patch_size, patch_overlap, patch_overlap_factor
        )

    def set_hyperparams(self, hyperparam_config: dict) -> None:
        """Reference set_hyperparams (:52-58). Thresholds are traced
        arguments of the compiled programs, so changing them does NOT
        trigger a recompile (the reference pays nothing per config because
        torch is eager; here the sweep reuses the cached XLA program)."""
        if "patch_overlap" in hyperparam_config:
            self.set_patch_overlap(*hyperparam_config["patch_overlap"])
        replacements = {}
        if "min_confidence" in hyperparam_config:
            replacements["min_confidence"] = hyperparam_config["min_confidence"]
        if "min_contour_area" in hyperparam_config:
            replacements["min_contour_area"] = hyperparam_config["min_contour_area"]
        if replacements:
            import dataclasses

            self.segmenter_config = dataclasses.replace(
                self.segmenter_config, **replacements
            )

    # ---------------- prediction ----------------

    def _maybe_calibrate_quant(self, image: Image.Image) -> None:
        """First-use calibration for the w8a8 serving path: run the FLOAT
        network once over up to 4 patch batches of this page to collect
        per-channel activation ranges, then swap in the quantized
        (network, variables) pair and drop the compiled-program caches."""
        if self._quant_calibrated:
            return
        from synthesis_in_style_tpu.models.doc_ufcn import DocUFCN
        from synthesis_in_style_tpu.models.doc_ufcn_quant import (
            quantize_for_serving,
        )

        if not isinstance(self.network, DocUFCN):
            raise ValueError(
                "quantized=True serving currently supports DocUFCN networks "
                f"only, got {type(self.network).__name__}"
            )
        batches = []
        for batch in self.crop_and_batch_patches(image):
            arr = batch["images"].astype(np.float32)
            batches.append((arr / 255.0 - 0.5) / 0.5)
            if len(batches) >= 4:
                break
        self.network, self.network_variables = quantize_for_serving(
            self.network, self.network_variables, batches
        )
        self._predict_fns.clear()
        self._fused_fns.clear()
        self._fused_pages_fns.clear()
        self._quant_calibrated = True

    def _make_patch_forward(self, device_filter: bool, area_filter: bool):
        """Pure traced patch forward: (images, min_confidence,
        min_contour_area) -> (B, P, P, nc) f32 probabilities, with
        normalization, softmax + confidence threshold, and (optionally) the
        device component filter inside. The thresholds are TRACED scalars —
        only `device_filter`/`area_filter` shape the program structure."""
        background = self.segmenter_config.background_class_id
        num_classes = self.segmenter_config.num_classes
        network = self.network
        variables = self.network_variables
        serving_dtype = self.serving_dtype

        def predict(images, min_confidence, min_contour_area):
            # Patches cross the host->device link as uint8 (4x less
            # transfer than normalized f32); the ToTensor+Normalize(0.5)
            # arithmetic (reference :114-128) runs on device with the
            # exact same f32 op sequence the host used to apply.
            images = (images.astype(jnp.float32) / 255.0 - 0.5) / 0.5
            if serving_dtype is not None:
                # params were cast once in __init__; matching the input
                # dtype keeps flax's promotion at bf16 end to end
                images = images.astype(serving_dtype)
            logits = network.apply(variables, images, train=False).astype(
                jnp.float32
            )
            probs = predict_probabilities(logits, min_confidence)
            if device_filter and area_filter:
                    from synthesis_in_style_tpu.segmentation.device_cc import (
                        binary_closing,
                        filter_small_components,
                    )

                    # Mirror the host postprocess semantics
                    # (models/base_segmenter.py get_contours_from_prediction):
                    # uint8-quantization foreground threshold (so
                    # min_confidence=0 is NOT a silent no-op), 5x5
                    # morphological close, then zero ONLY the small closed
                    # components — pixels outside any closed region keep
                    # their (tiny) probabilities exactly like the host path.
                    # Non-background classes fold into the batch axis so one
                    # while_loop labels them all at once.
                    b, h, w, _ = probs.shape
                    class_ids = [
                        c for c in range(num_classes) if c != background
                    ]
                    channels = jnp.stack(
                        [probs[..., c] for c in class_ids], axis=0
                    ).reshape(len(class_ids) * b, h, w)
                    # host path truncates via (p*255).astype(uint8), so a
                    # pixel is foreground iff p*255 >= 1 — match exactly
                    mask = (channels * 255.0) >= 1.0
                    closed = binary_closing(mask, 5)
                    big = filter_small_components(closed, min_contour_area)
                    small = jnp.logical_and(closed, jnp.logical_not(big))
                    kept = (channels * jnp.logical_not(small)).reshape(
                        len(class_ids), b, h, w
                    )
                    out = [None] * num_classes
                    for j, c in enumerate(class_ids):
                        out[c] = kept[j]
                    out[background] = probs[..., background]
                    probs = jnp.stack(out, axis=-1)
            return probs

        return predict

    def _area_filter_active(self) -> bool:
        return float(self.segmenter_config.min_contour_area) > 0

    def _get_predict_fn(self):
        # area_filter only shapes the program when the device filter is on
        key = (
            self.use_device_component_filter,
            self.use_device_component_filter and self._area_filter_active(),
        )
        fn = self._predict_fns.get(key)
        if fn is None:
            fn = jax.jit(self._make_patch_forward(*key))
            self._predict_fns[key] = fn
        return fn

    def _hyperparam_args(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Current thresholds as strongly-typed device scalars (stable avals
        -> value changes hit the jit cache)."""
        return (
            jnp.float32(self.segmenter_config.min_confidence),
            jnp.int32(self.segmenter_config.min_contour_area),
        )

    # Assembly op the fused whole-page program implements; the subclass
    # overrides it together with assemble_predictions.
    _fused_assembly = "max"

    def _get_fused_page_fn(
        self,
        padded_shape: Tuple[int, int, int],
        n_rows: int,
        output: str = "probs",
    ):
        """One jitted program for a whole page tiling: extract all patches
        from the (padded) uint8 page on device, run the patch forward in
        fixed-size batches under a fori_loop, and scatter each patch's
        probabilities into the page canvas with this class's assembly op
        (max for AnalysisSegmenter, summed voting for
        VotingAssemblySegmenter). The host uploads the page ONCE and fetches
        ONE assembled canvas — no per-batch dispatch round-trips and no host
        assembly loop (reference :130-164 runs strictly serially per batch).
        Compiled once per page tiling (thresholds are traced); cached.

        output="classes" appends a device argmax and returns a (hp, wp)
        uint8 class-id canvas instead of (hp, wp, nc) f32 confidences —
        num_classes*4x fewer device→host bytes for consumers that argmax
        anyway (evaluation, bbox/contour extraction).

        `n_rows` is the (static) padded tops length; the actual patch count
        is a TRACED argument of the returned fn, so pages with different
        tilings can share one compiled program (mixed-size batched serving,
        segment_images) — padding patches are masked to the assembly
        identity, which keeps results bit-equal to the page's own exact
        tiling."""
        key = (
            padded_shape,
            n_rows,
            self.batch_size,
            self._fused_assembly,
            self._area_filter_active(),
            output,
        )
        fn = self._fused_fns.get(key)
        if fn is not None:
            return fn

        # No host stage exists in the fused path, so the contour-area
        # filter must run on device regardless of use_device_component_filter.
        forward = self._make_patch_forward(
            device_filter=True, area_filter=self._area_filter_active()
        )
        p = self.patch_size
        b = self.batch_size
        nc = self.segmenter_config.num_classes
        assert n_rows % b == 0, (n_rows, b)
        n_batches = n_rows // b
        mode = self._fused_assembly
        hp, wp, channels = padded_shape
        lax = jax.lax

        @jax.jit
        def fused(page, tops, n_patches, min_confidence, min_contour_area):
            # page: (hp, wp, channels) uint8; tops: (n_rows, 2) int32
            # (top, left) per patch, zero-filled past n_patches (traced).
            # The canvas init derives from `page` so its type matches the
            # loop-carried canvas under shard_map (mesh serving): values
            # computed from sharded operands carry a device-varying type a
            # plain jnp.full would not.
            zero = page[..., :1].astype(jnp.float32) * 0.0  # (hp, wp, 1)
            if mode == "max":
                init = zero + jnp.full((1, 1, nc), -jnp.inf, jnp.float32)
            else:
                init = zero + jnp.zeros((1, 1, nc), jnp.float32)

            def batch_body(i, canvas):
                tls = lax.dynamic_slice(tops, (i * b, 0), (b, 2))
                patches = jax.vmap(
                    lambda t: lax.dynamic_slice(
                        page, (t[0], t[1], 0), (p, p, channels)
                    )
                )(tls)
                probs = forward(patches, min_confidence, min_contour_area)
                # Padding patches past n_patches must not contribute: the
                # assembly identity is -inf for max, 0 for summed voting.
                valid = (i * b + jnp.arange(b)) < n_patches
                if mode == "max":
                    probs = jnp.where(valid[:, None, None, None], probs, -jnp.inf)
                else:
                    probs = probs * valid[:, None, None, None]

                def patch_body(j, canvas):
                    start = (tls[j, 0], tls[j, 1], 0)
                    region = lax.dynamic_slice(canvas, start, (p, p, nc))
                    patch_probs = probs[j]
                    if mode == "max":
                        merged = jnp.maximum(region, patch_probs)
                    else:
                        merged = region + patch_probs
                    return lax.dynamic_update_slice(canvas, merged, start)

                return lax.fori_loop(0, b, patch_body, canvas)

            canvas = lax.fori_loop(0, n_batches, batch_body, init)
            if output == "classes":
                # Vote normalization (divide by a per-pixel positive total)
                # is argmax-invariant, so skip it; all-zero vote pixels and
                # nan_to_num'd pixels both argmax to class 0 either way.
                return jnp.argmax(canvas, axis=-1).astype(jnp.uint8)
            if mode == "vote":
                total = canvas.sum(axis=-1, keepdims=True)
                canvas = jnp.nan_to_num(canvas / total)
            return canvas

        self._fused_fns[key] = fused
        return fused

    def _get_fused_pages_fn(
        self,
        padded_shape: Tuple[int, int, int],
        n_rows: int,
        n_pages: int,
        output: str = "probs",
    ):
        """Throughput mode: N pages as ONE dispatch. `lax.map` over the
        single-page fused program keeps its slice/update-slice patch
        scatter intact (a vmap would lower them to gather/scatter); the
        device runs the pages back-to-back with zero host round-trips in
        between, so dispatch/transfer latency is paid once per group
        instead of once per page. Per-page patch counts are traced, so the
        pages in one dispatch may have DIFFERENT tilings (mixed-size
        serving) as long as they share the padded canvas + tops shape."""
        key = (
            padded_shape,
            n_rows,
            self.batch_size,
            self._fused_assembly,
            self._area_filter_active(),
            n_pages,
            output,
            self.mesh,
        )
        fn = self._fused_pages_fns.get(key)
        if fn is not None:
            return fn
        single = self._get_fused_page_fn(padded_shape, n_rows, output)

        def mapped(pages, tops, n_patches, min_confidence, min_contour_area):
            # pages: (N, hp, wp, C) uint8; tops: (N, n_rows, 2) int32;
            # n_patches: (N,) int32
            return jax.lax.map(
                lambda pt: single(
                    pt[0], pt[1], pt[2], min_confidence, min_contour_area
                ),
                (pages, tops, n_patches),
            )

        if self.mesh is not None:
            # Multi-chip serving: shard the page axis — each device runs
            # the page program on its own pages, zero collectives.
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            axis = self.mesh.axis_names[0]
            fused_pages = jax.jit(
                shard_map(
                    mapped,
                    mesh=self.mesh,
                    in_specs=(P(axis), P(axis), P(axis), P(), P()),
                    out_specs=P(axis),
                )
            )
        else:
            fused_pages = jax.jit(mapped)

        self._fused_pages_fns[key] = fused_pages
        return fused_pages

    def segment_images(
        self,
        images: List[Image.Image],
        pages_per_batch: int = 4,
        output: str = "probs",
        bucket_quantum: Optional[int] = 0,
    ) -> List[np.ndarray]:
        """Batched whole-page serving: segment many pages in fused
        multi-page dispatches of `pages_per_batch` (short final chunks are
        padded by repetition and the padding results dropped). Pages of
        DIFFERENT sizes batch together: each page's canvas is padded up to
        a bucket size (its tiling extent rounded up to `bucket_quantum`
        pixels; default the patch size) and its true patch count rides as
        a traced scalar, so the result of every page is bit-equal to its
        own exact tiling while one compiled program serves the whole
        bucket. `bucket_quantum=None` disables bucketing (exact-tiling
        groups only). Requires `fused_page_inference=True`; otherwise
        falls back to per-page `segment_image`. Results are returned in
        input order. The reference has no batched serving entry point
        (analysis_segmenter.py:176-188 is strictly one page per call),
        and real scan collections are mixed-size."""
        if not self.fused_page_inference or pages_per_batch <= 1:
            if output == "classes":
                return [self.segment_image_classes(image) for image in images]
            return [self.segment_image(image) for image in images]
        if self.mesh is not None:
            # each device gets an equal page shard
            n_dev = self.mesh.devices.size
            pages_per_batch = math.ceil(pages_per_batch / n_dev) * n_dev
        if bucket_quantum == 0:
            bucket_quantum = self.patch_size

        groups: Dict[tuple, List[tuple]] = {}
        for idx, image in enumerate(images):
            image = self._prepare_page(image)
            arr = np.asarray(image, dtype=np.uint8)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            bboxes = self.calculate_bboxes_for_patches(image.width, image.height)
            hp = max(bb.bottom for bb in bboxes)
            wp = max(bb.right for bb in bboxes)
            if bucket_quantum:
                q = bucket_quantum
                hp = math.ceil(hp / q) * q
                wp = math.ceil(wp / q) * q
                sig = (hp, wp, arr.shape[2])
            else:
                sig = (hp, wp, arr.shape[2], len(bboxes))
            groups.setdefault(sig, []).append((idx, arr, bboxes, hp, wp))

        results: List[Optional[np.ndarray]] = [None] * len(images)
        hyperparams = self._hyperparam_args()

        def drain(entry):
            canvases, chunk = entry
            canvases = np.asarray(canvases)
            for canvas, (idx, arr, *_rest) in zip(canvases, chunk):
                h, w = arr.shape[:2]
                results[idx] = canvas[:h, :w]

        for sig, members in groups.items():
            hp = max(m[3] for m in members)
            wp = max(m[4] for m in members)
            ch = members[0][1].shape[2]
            n_rows = max(
                math.ceil(len(m[2]) / self.batch_size) * self.batch_size
                for m in members
            )
            fused = self._get_fused_pages_fn(
                (hp, wp, ch), n_rows, pages_per_batch, output
            )
            # Async dispatch: keep a couple of groups in flight so the
            # device works on group i+1 while the host fetches group i.
            in_flight: List[tuple] = []
            for start in range(0, len(members), pages_per_batch):
                chunk = members[start : start + pages_per_batch]
                pages = np.zeros((pages_per_batch, hp, wp, ch), dtype=np.uint8)
                tops = np.zeros((pages_per_batch, n_rows, 2), dtype=np.int32)
                counts = np.zeros((pages_per_batch,), dtype=np.int32)
                for j, (_, arr, bboxes, *_rest) in enumerate(chunk):
                    h, w = arr.shape[:2]
                    n = len(bboxes)
                    pages[j, :h, :w] = arr
                    tops[j, :n, 0] = [bb.top for bb in bboxes]
                    tops[j, :n, 1] = [bb.left for bb in bboxes]
                    counts[j] = n
                for j in range(len(chunk), pages_per_batch):
                    pages[j] = pages[0]
                    tops[j] = tops[0]
                    counts[j] = counts[0]
                in_flight.append(
                    (
                        fused(
                            jnp.asarray(pages), jnp.asarray(tops),
                            jnp.asarray(counts), *hyperparams,
                        ),
                        chunk,
                    )
                )
                if len(in_flight) > 2:
                    drain(in_flight.pop(0))
            for entry in in_flight:
                drain(entry)
        return results  # type: ignore[return-value]

    def _segment_page_fused(
        self, image: Image.Image, output: str = "probs"
    ) -> np.ndarray:
        arr = np.asarray(image, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        h, w = arr.shape[:2]
        bboxes = self.calculate_bboxes_for_patches(image.width, image.height)
        # Pad the page so every patch slice is in-bounds; uint8 zeros
        # normalize to -1.0 on device, matching the host path's zero-padded
        # border crops.
        hp = max(bb.bottom for bb in bboxes)
        wp = max(bb.right for bb in bboxes)
        page = np.zeros((hp, wp, arr.shape[2]), dtype=np.uint8)
        page[:h, :w] = arr
        n = len(bboxes)
        n_pad = math.ceil(n / self.batch_size) * self.batch_size
        tops = np.zeros((n_pad, 2), dtype=np.int32)
        tops[:n, 0] = [bb.top for bb in bboxes]
        tops[:n, 1] = [bb.left for bb in bboxes]
        fused = self._get_fused_page_fn(page.shape, n_pad, output)
        canvas = np.asarray(
            fused(
                jnp.asarray(page), jnp.asarray(tops), jnp.int32(n),
                *self._hyperparam_args(),
            )
        )
        return canvas[:h, :w]

    def calculate_bboxes_for_patches(
        self, image_width: int, image_height: int
    ) -> Tuple[BBox, ...]:
        return calculate_bboxes_for_patches(
            image_width, image_height, self.patch_size, self.patch_overlap
        )

    def crop_and_batch_patches(self, input_image: Image.Image) -> Iterator[dict]:
        """(B, P, P, C) uint8 patch batches + their bboxes (reference
        :114-128). Border patches are zero-padded like PIL crop (uint8 0
        normalizes to -1.0 on device, matching the reference's padded
        crops). Normalization happens inside the jitted forward so only
        uint8 crosses the host->device link."""
        arr = np.asarray(input_image, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        h, w = arr.shape[:2]
        p = self.patch_size

        bboxes = self.calculate_bboxes_for_patches(input_image.width, input_image.height)
        for i in range(0, len(bboxes), self.batch_size):
            batch_bboxes = bboxes[i : i + self.batch_size]
            batch = np.zeros(
                (len(batch_bboxes), p, p, arr.shape[2]), dtype=np.uint8
            )
            for j, bbox in enumerate(batch_bboxes):
                y_end = min(bbox.bottom, h)
                x_end = min(bbox.right, w)
                crop = arr[bbox.top : y_end, bbox.left : x_end]
                batch[j, : crop.shape[0], : crop.shape[1]] = crop
            yield {"images": batch, "bboxes": batch_bboxes}

    def predict_patches(self, patches: Iterator[dict]) -> List[dict]:
        """(reference :130-142); runs the jitted forward per batch, pads the
        final partial batch to keep ONE compiled shape. `print_progress`
        wraps the batch loop in a progress bar (reference wraps with tqdm)."""
        if self.print_progress:
            try:
                from tqdm import tqdm

                patches = tqdm(patches, desc="predicting patches", leave=False)
            except ImportError:
                pass
        predict = self._get_predict_fn()
        hyperparams = self._hyperparam_args()
        predicted = []

        def drain(entry):
            device_probs, n, bboxes = entry
            probs = np.asarray(device_probs)[:n]
            if not self.use_device_component_filter:
                probs = remove_too_small_contours(
                    probs,
                    self.segmenter_config.min_contour_area,
                    self.segmenter_config.background_class_id,
                )
            for i, bbox in enumerate(bboxes):
                predicted.append({"prediction": probs[i], "bbox": bbox})

        # JAX dispatch is async: keep a few batches in flight so the device
        # forward of batch i+1 overlaps the host fetch + contour postprocess
        # of batch i (the reference runs strictly serially, :130-142).
        in_flight: List[tuple] = []
        for batch in patches:
            images = batch["images"]
            n = images.shape[0]
            if n < self.batch_size:
                pad = np.repeat(images[-1:], self.batch_size - n, axis=0)
                images = np.concatenate([images, pad], axis=0)
            in_flight.append(
                (predict(jnp.asarray(images), *hyperparams), n, batch["bboxes"])
            )
            if len(in_flight) > 4:
                drain(in_flight.pop(0))
        for entry in in_flight:
            drain(entry)
        return predicted

    def assemble_predictions(
        self, patches: List[dict], output_size: Tuple[int, int]
    ) -> np.ndarray:
        """Per-pixel max across overlapping patches (reference :144-164).
        Returns (H, W, C)."""
        num_classes = self.segmenter_config.num_classes
        max_width, max_height = output_size
        assembled = np.full(
            (max_height, max_width, num_classes), -np.inf, dtype=np.float32
        )
        for patch in patches:
            x_start, y_start, x_end, y_end = patch["bbox"]
            x_end = min(x_end, max_width)
            y_end = min(y_end, max_height)
            window = patch["prediction"][: y_end - y_start, : x_end - x_start, :]
            region = assembled[y_start:y_end, x_start:x_end, :]
            assembled[y_start:y_end, x_start:x_end, :] = np.maximum(region, window)
        return assembled

    def convert_image_to_correct_color_space(self, image: Image.Image) -> Image.Image:
        channels = self.segmenter_config.num_input_channels
        if channels == 3:
            return image.convert("RGB")
        if channels == 1:
            return image.convert("L")
        raise ValueError(
            "Can not convert input image to desired format, Network desires "
            f"inputs with {channels} channels."
        )

    def _prepare_page(self, image: Image.Image) -> Image.Image:
        """Shared page preprocessing for every serving entry point: color
        space, max-size thumbnail, first-use quant calibration."""
        image = self.convert_image_to_correct_color_space(image)
        if self.max_image_size and any(
            side > self.max_image_size for side in image.size
        ):
            image.thumbnail((self.max_image_size, self.max_image_size))
        self._maybe_calibrate_quant(image)
        return image

    def segment_image(self, image: Image.Image) -> np.ndarray:
        """Full-page inference (reference :176-188). Returns (H, W, C)
        assembled class confidences."""
        image = self._prepare_page(image)
        if self.fused_page_inference:
            return self._segment_page_fused(image)
        patches = self.crop_and_batch_patches(image)
        predicted = self.predict_patches(patches)
        return self.assemble_predictions(predicted, image.size)

    def segment_image_classes(self, image: Image.Image) -> np.ndarray:
        """Full-page inference returning the (H, W) uint8 class-id map
        (argmax of the assembled confidences). On the fused path the argmax
        runs on device, so the fetch is num_classes*4x smaller than
        `segment_image` — use this whenever downstream only needs class
        ids (evaluation, bbox/contour extraction), and `segment_image`
        when it needs the confidences themselves."""
        if self.fused_page_inference:
            image = self._prepare_page(image)
            return self._segment_page_fused(image, output="classes")
        return np.argmax(self.segment_image(image), axis=-1).astype(np.uint8)

    def prediction_to_color_image(self, assembled_prediction: np.ndarray) -> Image.Image:
        from synthesis_in_style_tpu.visualization.utils import (
            network_output_to_color_image,
        )

        colored = network_output_to_color_image(
            assembled_prediction[None],
            self.class_to_color_map,
            show_confidence_in_segmentation=self.show_confidence_in_segmentation,
        )
        return Image.fromarray(colored[0])


class VotingAssemblySegmenter(AnalysisSegmenter):
    """Summed-confidence voting assembly (reference :198-223)."""

    _fused_assembly = "vote"

    def assemble_predictions(
        self, patches: List[dict], output_size: Tuple[int, int]
    ) -> np.ndarray:
        num_classes = self.segmenter_config.num_classes
        max_width, max_height = output_size
        summed = np.zeros((max_height, max_width, num_classes), dtype=np.float32)
        for patch in patches:
            x_start, y_start, x_end, y_end = patch["bbox"]
            x_start, y_start = max(x_start, 0), max(y_start, 0)
            x_end = min(x_end, max_width)
            y_end = min(y_end, max_height)
            summed[y_start:y_end, x_start:x_end, :] += patch["prediction"][
                : y_end - y_start, : x_end - x_start, :
            ]
        with np.errstate(invalid="ignore", divide="ignore"):
            normalized = summed / summed.sum(axis=-1, keepdims=True)
        return np.nan_to_num(normalized)
