"""Native runtime components (C++), loaded through ctypes.

`fast_png` is a multi-threaded zlib PNG writer for the dataset-synthesis
hot loop (see fast_png.cpp). The shared library is compiled on first use
with g++ and cached next to the source; everything degrades gracefully to
PIL when no compiler is available.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).parent
_LIB_PATH = _NATIVE_DIR / "libfastpng.so"
_SOURCE_PATH = _NATIVE_DIR / "fast_png.cpp"

_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def get_fastpng() -> Optional[ctypes.CDLL]:
    """Load (compiling if needed) the fastpng library; None if unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    from synthesis_in_style_tpu.native._build import load_native

    _lib = load_native(
        _SOURCE_PATH, _LIB_PATH, ["-lz", "-lpthread"], _bind
    )
    _load_failed = _lib is None
    return _lib


def _bind(lib: ctypes.CDLL) -> None:
    lib.fastpng_encode.restype = ctypes.c_int
    lib.fastpng_encode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_size_t),
    ]
    lib.fastpng_bound.restype = ctypes.c_size_t
    lib.fastpng_bound.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.fastpng_write_batch.restype = ctypes.c_int
    lib.fastpng_write_batch.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.c_int,
    ]


def encode_png(image: np.ndarray, compression: int = 6) -> Optional[bytes]:
    """Encode one (H, W, 3) uint8 image to PNG bytes; None on failure."""
    lib = get_fastpng()
    if lib is None:
        return None
    image = np.ascontiguousarray(image, np.uint8)
    h, w = image.shape[:2]
    cap = lib.fastpng_bound(h, w)
    out = (ctypes.c_uint8 * cap)()
    out_len = ctypes.c_size_t(0)
    rc = lib.fastpng_encode(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        compression, out, cap, ctypes.byref(out_len),
    )
    if rc != 0:
        return None
    # copy only the encoded bytes, not the full compressBound capacity
    return ctypes.string_at(out, out_len.value)


def write_png_batch(
    images: np.ndarray,
    paths: Sequence[Path],
    compression: int = 6,
    num_threads: int = 0,
) -> bool:
    """Write a (N, H, W, 3) uint8 batch to `paths` in parallel via the native
    writer. Returns False when the native path is unavailable or failed —
    callers fall back to PIL."""
    lib = get_fastpng()
    if lib is None:
        return False
    images = np.ascontiguousarray(images, np.uint8)
    if images.ndim != 4 or images.shape[-1] != 3:
        return False
    n, h, w, _ = images.shape
    if len(paths) != n:
        # a short paths list would hand NULL char pointers to fopen() in C
        return False
    encoded_paths: List[bytes] = [str(p).encode() for p in paths]
    arr = (ctypes.c_char_p * n)(*encoded_paths)
    rc = lib.fastpng_write_batch(
        images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n, h, w,
        arr, compression, num_threads,
    )
    return rc == 0
