"""Build + bind the native RLE library.

Compiled lazily on first use with g++ into a per-source-hash .so next to
the sources (rebuilds automatically when rle.cpp changes); loaded via
ctypes.  Every caller has a NumPy fallback — ``load_native()`` returns
None when no compiler is available, and core/rasterize keeps working.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "rle.cpp")
_cached: Optional[object] = None
_failed = False


def _lib_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_DIR, f"librle_{digest}.so")


def _compile(path: str) -> bool:
    try:
        # build into a temp file + atomic rename (parallel test runners)
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
        os.close(fd)
        proc = subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", tmp],
            capture_output=True,
            timeout=120,
        )
        if proc.returncode != 0:
            os.unlink(tmp)
            return False
        os.replace(tmp, path)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def load_native():
    """Return the bound ctypes library, or None if unavailable."""
    global _cached, _failed
    if _cached is not None:
        return _cached
    if _failed:
        return None
    path = _lib_path()
    if not os.path.exists(path) and not _compile(path):
        _failed = True
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        _failed = True
        return None

    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    i64 = ctypes.c_int64

    lib.rle_encode.restype = i64
    lib.rle_encode.argtypes = [u8p, i64, i64, u32p, i64]
    lib.rle_decode.restype = None
    lib.rle_decode.argtypes = [u32p, i64, u8p, i64, i64]
    lib.rle_area.restype = ctypes.c_uint64
    lib.rle_area.argtypes = [u32p, i64]
    lib.rle_iou.restype = ctypes.c_double
    lib.rle_iou.argtypes = [u32p, i64, u32p, i64]
    lib.rle_iou_matrix.restype = None
    lib.rle_iou_matrix.argtypes = [u32p, i64p, i64p, i64, i64p, i64p, i64, f64p]

    _cached = lib
    return lib


# ---------------------------------------------------------------------------
# numpy-facing wrappers (native with automatic fallback)
# ---------------------------------------------------------------------------

def rle_encode_native(mask: np.ndarray) -> Optional[dict]:
    lib = load_native()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, dtype=np.uint8)
    h, w = mask.shape
    out = np.empty(h * w + 1, dtype=np.uint32)
    n = lib.rle_encode(mask, h, w, out, out.size)
    if n < 0:
        return None
    return {"size": [h, w], "counts": out[:n].astype(np.int64).tolist()}


def rle_decode_native(rle: dict) -> Optional[np.ndarray]:
    lib = load_native()
    if lib is None:
        return None
    h, w = rle["size"]
    counts = np.ascontiguousarray(rle["counts"], dtype=np.uint32)
    out = np.empty((h, w), dtype=np.uint8)
    lib.rle_decode(counts, len(counts), out, h, w)
    return out


def rle_iou_native(a: dict, b: dict) -> Optional[float]:
    lib = load_native()
    if lib is None:
        return None
    ca = np.ascontiguousarray(a["counts"], dtype=np.uint32)
    cb = np.ascontiguousarray(b["counts"], dtype=np.uint32)
    return float(lib.rle_iou(ca, len(ca), cb, len(cb)))


def rle_iou_matrix_native(preds: list[dict], gts: list[dict]) -> Optional[np.ndarray]:
    """Pairwise IoU of RLE lists via one C call (AP evaluation hot path)."""
    lib = load_native()
    if lib is None:
        return None
    all_counts = [np.asarray(r["counts"], dtype=np.uint32) for r in preds + gts]
    if all_counts:
        buf = np.ascontiguousarray(np.concatenate(all_counts))
    else:
        buf = np.zeros(1, dtype=np.uint32)
    lens = np.asarray([len(c) for c in all_counts], dtype=np.int64)
    offsets = np.zeros(len(all_counts), dtype=np.int64)
    if len(all_counts) > 1:
        offsets[1:] = np.cumsum(lens)[:-1]
    pa, pb = len(preds), len(gts)
    out = np.zeros((pa, pb), dtype=np.float64)
    if pa and pb:
        lib.rle_iou_matrix(
            buf,
            np.ascontiguousarray(offsets[:pa]), np.ascontiguousarray(lens[:pa]), pa,
            np.ascontiguousarray(offsets[pa:]), np.ascontiguousarray(lens[pa:]), pb,
            out,
        )
    return out
