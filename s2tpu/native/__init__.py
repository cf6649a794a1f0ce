"""Native (C++) host-runtime components, loaded via ctypes.

Build happens lazily on first import (g++ -O3 -shared); everything here has
a pure-numpy fallback so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np

from s2tpu.utils import get_logger

logger = get_logger(__name__)

_SRC = Path(__file__).parent / "gather.cc"
_lib: ctypes.CDLL | None = None
_tried = False


def _lib_path() -> Path:
    # The binary is keyed by a content hash of the source, so a clone with a
    # stale artifact (git does not preserve mtimes) can never load a binary
    # that doesn't match gather.cc. Built without -march=native: the .so may
    # travel between hosts and a SIGILL mid-gather is worse than a few % of
    # memcpy throughput.
    digest = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    return Path(__file__).parent / f"libs2tpu_native_{digest}.so"


def _build(lib_path: Path) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             str(_SRC), "-o", str(lib_path), "-lpthread"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception as e:  # noqa: BLE001
        logger.warning(f"native build failed ({e}); using numpy fallback")
        return False


def load() -> ctypes.CDLL | None:
    """Load (building if needed) the native library; None on failure."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    lib_path = _lib_path()
    if not lib_path.exists() and not _build(lib_path):
        return None
    try:
        lib = ctypes.CDLL(str(lib_path))
        lib.gather_crops_i16_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64,
        ]
        lib.gather_crops_i16_u8.restype = None
        lib.gather_crops_flips_i16_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64,
        ]
        lib.gather_crops_flips_i16_u8.restype = None
        _lib = lib
    except OSError as e:
        logger.warning(f"native load failed ({e}); using numpy fallback")
    return _lib


def gather_crops(
    images: np.ndarray,
    labels: np.ndarray,
    indices: np.ndarray,
    ys: np.ndarray,
    xs: np.ndarray,
    crop: int,
    num_threads: int = 0,
    flip_h: np.ndarray | None = None,
    flip_v: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray] | None:
    """Native (B,crop,crop,C) int16 + (B,crop,crop) int32 batch gather,
    with optional per-sample H/V flips applied during the copy (host-side
    augmentation — removes the flip ops from the device step program).

    Returns None when preconditions fail (caller falls back to numpy):
    requires contiguous int16 (N,H,W,C) images and uint8 (N,H,W) labels.
    """
    lib = load()
    if (
        lib is None
        or images.dtype != np.int16
        or labels.dtype != np.uint8
        or images.ndim != 4
        or not images.flags.c_contiguous
        or not labels.flags.c_contiguous
    ):
        return None
    n, h, w, c = images.shape
    b = len(indices)
    out = np.empty((b, crop, crop, c), np.int16)
    lout = np.empty((b, crop, crop), np.int32)
    idx = np.ascontiguousarray(indices, np.int64)
    ys64 = np.ascontiguousarray(ys, np.int64)
    xs64 = np.ascontiguousarray(xs, np.int64)
    if num_threads <= 0:
        num_threads = min(8, os.cpu_count() or 1)
    fh = None if flip_h is None else np.ascontiguousarray(flip_h, np.uint8)
    fv = None if flip_v is None else np.ascontiguousarray(flip_v, np.uint8)
    lib.gather_crops_flips_i16_u8(
        images.ctypes.data, labels.ctypes.data,
        h, w, c,
        idx.ctypes.data, ys64.ctypes.data, xs64.ctypes.data,
        None if fh is None else fh.ctypes.data,
        None if fv is None else fv.ctypes.data,
        b, crop,
        out.ctypes.data, lout.ctypes.data,
        num_threads,
    )
    return out, lout
