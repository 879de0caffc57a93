"""Polygon and RLE mask codecs (pure NumPy + OpenCV rasterization).

Replaces the native mask codecs the reference leans on through its
dependencies (SURVEY.md §2.10): pycocotools' C RLE codec
(``coco.annToMask`` at reference transfer_coco.py:183) and ochumanApi's
``Poly2Mask`` (reference transfer_ochuman.py:179).  Offline converter
code — perf-noncritical, correctness-critical.

The compressed-RLE string format is COCO-compatible (5-bit varint with
continuation flag, delta-coded from the 4th count on, column-major
runs starting with zeros) so real COCO annotation files decode
directly.  A C++ fast path may be layered under this module later; the
NumPy implementation is the reference semantics.
"""
from __future__ import annotations

from typing import Any, Sequence

import numpy as np


# ---------------------------------------------------------------------------
# polygons
# ---------------------------------------------------------------------------

def polygons_to_mask(polygons: Sequence[Sequence[float]], height: int, width: int) -> np.ndarray:
    """Rasterize COCO-style polygons ([[x0,y0,x1,y1,...], ...]) to uint8 0/255."""
    import cv2

    mask = np.zeros((height, width), dtype=np.uint8)
    pts = [
        np.asarray(p, dtype=np.float64).reshape(-1, 2).round().astype(np.int32)
        for p in polygons
        if len(p) >= 6
    ]
    if pts:
        cv2.fillPoly(mask, pts, 255)
    return mask


# ---------------------------------------------------------------------------
# uncompressed RLE
# ---------------------------------------------------------------------------

def rle_encode(mask: np.ndarray) -> dict:
    """Encode a binary mask as uncompressed COCO RLE.

    Runs are column-major (Fortran order) and start with the count of
    zeros, matching the COCO convention.
    """
    mask = np.asarray(mask)
    h, w = mask.shape
    flat = (mask.flatten(order="F") > 0).astype(np.int8)
    if flat.size == 0:
        return {"size": [h, w], "counts": []}
    change = np.nonzero(np.diff(flat))[0] + 1
    bounds = np.concatenate(([0], change, [flat.size]))
    counts = np.diff(bounds).tolist()
    if flat[0] == 1:
        counts = [0] + counts
    return {"size": [h, w], "counts": counts}


def rle_decode(rle: dict) -> np.ndarray:
    """Decode uncompressed COCO RLE to a uint8 0/255 mask."""
    h, w = rle["size"]
    counts = np.asarray(rle["counts"], dtype=np.int64)
    flat = np.zeros(h * w, dtype=np.uint8)
    pos = np.concatenate(([0], np.cumsum(counts)))
    for i in range(1, len(counts), 2):  # odd runs are ones
        flat[pos[i] : pos[i + 1]] = 255
    return flat.reshape((h, w), order="F")


def rle_area(rle: dict) -> int:
    """Foreground pixel count of an RLE (sum of odd-indexed runs)."""
    counts = rle["counts"]
    return int(sum(counts[1::2]))


# ---------------------------------------------------------------------------
# compressed RLE (COCO string format)
# ---------------------------------------------------------------------------

def rle_to_string(rle: dict) -> str:
    """Compress RLE counts to the COCO ascii string format."""
    counts = [int(c) for c in rle["counts"]]
    chars = []
    for i, cnt in enumerate(counts):
        x = cnt
        if i > 2:
            x -= counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            chars.append(chr(c + 48))
    return "".join(chars)


def rle_from_string(s: str, height: int, width: int) -> dict:
    """Decompress a COCO ascii RLE string to uncompressed counts."""
    counts: list[int] = []
    i = 0
    n = len(s)
    while i < n:
        x = 0
        k = 0
        more = True
        while more:
            c = ord(s[i]) - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(counts) > 2:
            x += counts[-2]
        counts.append(x)
    return {"size": [height, width], "counts": counts}


# ---------------------------------------------------------------------------
# COCO segmentation field -> mask
# ---------------------------------------------------------------------------

def segmentation_to_mask(segm: Any, height: int, width: int) -> np.ndarray:
    """Rasterize a COCO ``segmentation`` field of any flavor to uint8 0/255.

    Handles polygon lists, uncompressed RLE dicts (counts as list) and
    compressed RLE dicts (counts as str/bytes) — the three shapes
    ``pycocotools.coco.annToMask`` accepts at reference
    transfer_coco.py:183.
    """
    if isinstance(segm, dict):
        counts = segm["counts"]
        h, w = segm["size"]
        if isinstance(counts, (bytes, bytearray)):
            counts = counts.decode("ascii")
        if isinstance(counts, str):
            return rle_decode(rle_from_string(counts, h, w))
        return rle_decode(segm)
    return polygons_to_mask(segm, height, width)


def rle_iou(a: dict, b: dict) -> float:
    """IoU of two RLE masks (decoded; converters are offline code)."""
    ma = rle_decode(a) > 0
    mb = rle_decode(b) > 0
    union = np.logical_or(ma, mb).sum()
    if union == 0:
        return 1.0
    return float(np.logical_and(ma, mb).sum()) / float(union)
