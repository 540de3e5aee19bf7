"""Shared build-on-first-use loader for the native (C++) runtime pieces.

One implementation of the pattern both fast_png and the contour engine use:
compile with g++ into a TEMP file and atomically rename into place (so
concurrent builders — multiprocess contour-pool workers, parallel test
runs — can never publish a half-written .so), reload when the source is
newer than the cache, bind the symbol table, and degrade to None (pure
Python fallback) on ANY failure, including a stale library that predates a
newly added symbol (AttributeError during binding)."""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Callable, List, Optional


def build_library(
    source: Path, lib_path: Path, extra_flags: List[str], timeout: int = 240
) -> bool:
    """g++-compile `source` into `lib_path` via a temp file + atomic rename.

    `extra_flags` holds include dirs and -l libraries (link flags stay after
    -o, where g++ accepts them)."""
    fd, tmp = tempfile.mkstemp(
        suffix=".so", prefix=lib_path.stem + ".", dir=str(lib_path.parent)
    )
    os.close(fd)
    cmd = (
        ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", str(source)]
        + ["-o", tmp]
        + extra_flags
    )
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=timeout)
        os.replace(tmp, lib_path)  # atomic on POSIX
        return True
    except (OSError, subprocess.SubprocessError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def load_native(
    source: Path,
    lib_path: Path,
    extra_flags: List[str],
    bind: Callable[[ctypes.CDLL], None],
) -> Optional[ctypes.CDLL]:
    """Build (if stale/missing), load, and bind a native library.

    Returns None — the callers' signal to use the pure path — when no
    compiler/headers are available AND no loadable, symbol-complete cached
    library exists."""
    stale = not lib_path.exists() or (
        source.exists() and source.stat().st_mtime > lib_path.stat().st_mtime
    )
    if stale and not build_library(source, lib_path, extra_flags):
        if not lib_path.exists():
            return None
        # fall through: a stale-but-present .so (mtimes after a fresh clone
        # are arbitrary) may still be loadable AND symbol-complete — `bind`
        # below rejects it otherwise
    try:
        lib = ctypes.CDLL(str(lib_path))
        bind(lib)
        return lib
    except (OSError, AttributeError):
        # unloadable file, or a stale build missing a newly added symbol
        return None
