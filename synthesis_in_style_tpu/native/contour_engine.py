"""ctypes loader/wrappers for the native contour engine (contour_engine.cpp).

Same on-demand g++ build-and-cache pattern as fast_png; links against the
system OpenCV (core + imgproc). Everything degrades gracefully to the pure
Python engine in segmentation/contours.py when no compiler or OpenCV dev
install is available — callers must treat `get_contour_engine()` returning
None as "use the pure path".

Packed contour-set format (matching the C ABI):
  points  int32 (total_pts, 2)
  offsets int64 (n + 1,)   contour i = points[offsets[i]:offsets[i+1]]
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np


def _n_threads() -> int:
    """Host threads for the batch-level native calls (dilate/find, render).
    SIS_CONTOUR_THREADS overrides; defaults to the core count. A malformed
    override falls back to the default — every other knob in this module
    degrades gracefully, so this one must not abort the pipeline."""
    env = os.environ.get("SIS_CONTOUR_THREADS")
    if env:
        try:
            return max(1, int(env))
        except ValueError:
            pass
    return max(1, os.cpu_count() or 1)

_NATIVE_DIR = Path(__file__).parent
_LIB_PATH = _NATIVE_DIR / "libcontourengine.so"
_SOURCE_PATH = _NATIVE_DIR / "contour_engine.cpp"

_lib: Optional[ctypes.CDLL] = None
_load_failed = False

_I32P = ctypes.POINTER(ctypes.c_int32)
_I64P = ctypes.POINTER(ctypes.c_int64)
_U8P = ctypes.POINTER(ctypes.c_uint8)


def _opencv_flags() -> Optional[List[str]]:
    for inc in ("/usr/include/opencv4", "/usr/include/x86_64-linux-gnu/opencv4"):
        if (Path(inc) / "opencv2/imgproc.hpp").exists():
            return [f"-I{inc}", "-lopencv_core", "-lopencv_imgproc"]
    return None


def get_contour_engine() -> Optional[ctypes.CDLL]:
    """Load (compiling if needed) the native engine; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    from synthesis_in_style_tpu.native._build import load_native

    flags = _opencv_flags()
    _lib = (
        load_native(_SOURCE_PATH, _LIB_PATH, flags, _bind)
        if flags is not None
        else None
    )
    _load_failed = _lib is None
    return _lib


# Bumped whenever an exported signature changes. _bind refuses a library
# reporting a different version: symbol PRESENCE alone cannot detect a
# stale cached .so after an argument was inserted mid-signature, and
# load_native's documented fall-through would otherwise bind it (a wrong
# arity ctypes call reinterprets ints as pointers -> SIGSEGV, not the
# designed graceful pure-path fallback).
_ABI_VERSION = 2


def _bind(lib: ctypes.CDLL) -> None:
    lib.sis_abi_version.restype = ctypes.c_int32
    lib.sis_abi_version.argtypes = []
    found = lib.sis_abi_version()
    if found != _ABI_VERSION:
        raise AttributeError(
            f"contour engine ABI {found} != expected {_ABI_VERSION}"
        )
    lib.sis_dilate_find_contours.restype = ctypes.c_int
    lib.sis_dilate_find_contours.argtypes = [
        _U8P, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32,
        _I32P, ctypes.c_int64, _I64P, ctypes.c_int32, _I32P, _I32P,
    ]
    lib.sis_merge_contours.restype = ctypes.c_int
    lib.sis_merge_contours.argtypes = [
        _I32P, _I64P, ctypes.c_int32, ctypes.c_int32,
        _I32P, ctypes.c_int64, _I64P, ctypes.c_int32, _I32P,
    ]
    lib.sis_overlap_counts.restype = ctypes.c_int
    lib.sis_overlap_counts.argtypes = [
        _I32P, _I64P, ctypes.c_int32,
        _I32P, _I64P, ctypes.c_int32, _I64P,
    ]
    lib.sis_render.restype = ctypes.c_int
    lib.sis_render.argtypes = [
        _I32P, _I64P, _I32P, _I32P, ctypes.c_int32,
        _U8P, ctypes.c_int32, ctypes.c_int32,
        _U8P, ctypes.c_int32, ctypes.c_int32, _U8P,
    ]


def pack_contours(
    contours: Sequence[np.ndarray],
) -> Tuple[np.ndarray, np.ndarray]:
    """OpenCV contour list -> (points int32 (P,2), offsets int64 (n+1,))."""
    offsets = np.zeros(len(contours) + 1, np.int64)
    flat = []
    for i, c in enumerate(contours):
        pts = np.ascontiguousarray(c.reshape(-1, 2), np.int32)
        flat.append(pts)
        offsets[i + 1] = offsets[i] + pts.size
    points = (
        np.concatenate(flat, axis=0)
        if flat
        else np.zeros((0, 2), np.int32)
    )
    return np.ascontiguousarray(points), offsets


def unpack_contours(
    points: np.ndarray, offsets: np.ndarray, n: int
) -> List[np.ndarray]:
    """Packed set -> OpenCV-shaped (P, 1, 2) int32 contour list.

    Copies each contour: views into the (generously over-allocated) output
    buffer would pin the whole buffer in memory for as long as any contour
    lives — and contours live across the entire segmentation pipeline."""
    out = []
    flat = points.reshape(-1)
    for i in range(n):
        out.append(np.array(flat[offsets[i] : offsets[i + 1]]).reshape(-1, 1, 2))
    return out


def _ptr(a: np.ndarray, typ):
    return a.ctypes.data_as(typ)


def merge_contours_native(
    lib: ctypes.CDLL,
    contours: Sequence[np.ndarray],
    only_keep_overlapping: bool = False,
) -> List[np.ndarray]:
    points, offsets = pack_contours(contours)
    # merged external contours are CHAIN_APPROX_NONE boundary walks, so the
    # output can be (much) larger than the SIMPLE-approximated inputs; start
    # generous, retry doubled if the engine reports overflow
    pts_cap = max(4096, int(points.size) * 8)
    offs_cap = max(64, len(contours) + 1)
    while True:
        out_pts = np.empty(pts_cap, np.int32)
        out_offs = np.empty(offs_cap, np.int64)
        out_n = ctypes.c_int32(0)
        rc = lib.sis_merge_contours(
            _ptr(points, _I32P), _ptr(offsets, _I64P),
            ctypes.c_int32(len(contours)),
            ctypes.c_int32(1 if only_keep_overlapping else 0),
            _ptr(out_pts, _I32P), ctypes.c_int64(pts_cap),
            _ptr(out_offs, _I64P), ctypes.c_int32(offs_cap),
            ctypes.byref(out_n),
        )
        if rc == 0:
            return unpack_contours(out_pts, out_offs, out_n.value)
        if rc != 1:
            raise RuntimeError(f"sis_merge_contours failed rc={rc}")
        pts_cap *= 4
        offs_cap *= 4


def overlap_counts_packed_native(
    lib: ctypes.CDLL,
    packed_a: Tuple[np.ndarray, np.ndarray],
    n_a: int,
    contours_b: Sequence[np.ndarray],
) -> np.ndarray:
    """(n_a, len(b)) int64 filled-overlap counts; `packed_a` pre-packed so
    callers comparing one set against many can pack it once."""
    pa, oa = packed_a
    pb, ob = pack_contours(contours_b)
    out = np.zeros((n_a, len(contours_b)), np.int64)
    rc = lib.sis_overlap_counts(
        _ptr(pa, _I32P), _ptr(oa, _I64P), ctypes.c_int32(n_a),
        _ptr(pb, _I32P), _ptr(ob, _I64P), ctypes.c_int32(len(contours_b)),
        _ptr(out, _I64P),
    )
    if rc != 0:
        raise RuntimeError(f"sis_overlap_counts failed rc={rc}")
    return out


def overlap_counts_native(
    lib: ctypes.CDLL,
    contours_a: Sequence[np.ndarray],
    contours_b: Sequence[np.ndarray],
) -> np.ndarray:
    """(len(a), len(b)) int64 filled-overlap pixel counts."""
    return overlap_counts_packed_native(
        lib, pack_contours(contours_a), len(contours_a), contours_b
    )


def render_native(
    lib: ctypes.CDLL,
    contours: Sequence[np.ndarray],
    contour_image: np.ndarray,  # int32 (n,) batch id per contour
    contour_color: np.ndarray,  # int32 (n,) color-table row per contour
    fine_mask: np.ndarray,  # uint8 (B, S, S) cluster mask
    colors: np.ndarray,  # uint8 (n_colors, 3); row 0 = background
) -> np.ndarray:
    """Paint (contour AND fine-mask) pixels per class onto background-
    colored canvases; contours paint in list order (later wins)."""
    points, offsets = pack_contours(contours)
    fine_mask = np.ascontiguousarray(fine_mask, np.uint8)
    colors = np.ascontiguousarray(colors, np.uint8)
    batch, size, _ = fine_mask.shape
    out = np.empty((batch, size, size, 3), np.uint8)
    rc = lib.sis_render(
        _ptr(points, _I32P), _ptr(offsets, _I64P),
        _ptr(np.ascontiguousarray(contour_image, np.int32), _I32P),
        _ptr(np.ascontiguousarray(contour_color, np.int32), _I32P),
        ctypes.c_int32(len(contours)),
        _ptr(fine_mask, _U8P), ctypes.c_int32(batch), ctypes.c_int32(size),
        _ptr(colors, _U8P), ctypes.c_int32(len(colors)),
        ctypes.c_int32(_n_threads()), _ptr(out, _U8P),
    )
    if rc != 0:
        raise RuntimeError(f"sis_render failed rc={rc}")
    return out


def dilate_find_contours_native(
    lib: ctypes.CDLL, masks: np.ndarray
) -> List[List[np.ndarray]]:
    """(N, H, W) uint8 -> per-mask external contours of the 3x3-cross
    dilation (CHAIN_APPROX_SIMPLE)."""
    masks = np.ascontiguousarray(masks, np.uint8)
    n_masks, h, w = masks.shape
    pts_cap = max(4096, n_masks * h * w // 4)
    offs_cap = max(256, n_masks * 64)
    while True:
        out_pts = np.empty(pts_cap, np.int32)
        out_offs = np.empty(offs_cap, np.int64)
        mask_offs = np.empty(n_masks + 1, np.int32)
        out_n = ctypes.c_int32(0)
        rc = lib.sis_dilate_find_contours(
            _ptr(masks, _U8P), ctypes.c_int32(n_masks),
            ctypes.c_int32(h), ctypes.c_int32(w),
            ctypes.c_int32(_n_threads()),
            _ptr(out_pts, _I32P), ctypes.c_int64(pts_cap),
            _ptr(out_offs, _I64P), ctypes.c_int32(offs_cap),
            _ptr(mask_offs, _I32P), ctypes.byref(out_n),
        )
        if rc == 0:
            all_contours = unpack_contours(out_pts, out_offs, out_n.value)
            return [
                all_contours[mask_offs[m] : mask_offs[m + 1]]
                for m in range(n_masks)
            ]
        if rc != 1:
            raise RuntimeError(f"sis_dilate_find_contours failed rc={rc}")
        pts_cap *= 4
        offs_cap *= 4
