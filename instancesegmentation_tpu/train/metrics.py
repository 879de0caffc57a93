"""Scalar logging + periodic image-grid dumps.

Replaces the reference's print statements and live cv.imshow dashboard
(reference train_instance.py:385-390,428-469,511-513 — which hard-
required an X display, bug SURVEY.md §2.3.4) with JSONL scalar logs and
PNG grid artifacts written to disk.
"""
from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np


class MetricLogger:
    def __init__(self, out_dir: str, name: str = "metrics", enabled: bool = True):
        """``enabled=False`` makes every method a no-op and touches no
        files — multi-host training passes this on non-main processes so
        a shared out_dir sees exactly one writer."""
        self.enabled = enabled
        self.t0 = time.time()
        if not enabled:
            self.path = None
            self._f = None
            return
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, f"{name}.jsonl")
        self._f = open(self.path, "a")

    def log(self, step: int, **scalars) -> None:
        if not self.enabled:
            return
        rec = {"step": int(step), "time": round(time.time() - self.t0, 3)}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self) -> None:
        if self.enabled:
            self._f.close()


def dump_image_grid(
    out_dir: str,
    tag: str,
    images: np.ndarray,    # [B, H, W, 3] in [-1, 1]
    targets: np.ndarray,   # [B, H, W, 1] in [0, 1]
    probs: np.ndarray,     # [B, H, W, 1] in [0, 1]
    max_rows: int = 4,
) -> Optional[str]:
    """Write an ``image | target | overlay | prediction`` grid PNG
    (the reference dashboard's row layout, ref :459-466)."""
    import cv2

    from instancesegmentation_tpu.core.visualize import draw_mask, image_grid

    os.makedirs(out_dir, exist_ok=True)
    rows = []
    for i in range(min(max_rows, images.shape[0])):
        img = ((np.asarray(images[i]) + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
        tgt = (np.asarray(targets[i, ..., 0]) * 255).astype(np.uint8)
        prd = (np.asarray(probs[i, ..., 0]) * 255).astype(np.uint8)
        mix = img.copy()
        draw_mask(mix, prd)
        tgt3 = np.repeat(tgt[..., None], 3, axis=-1)
        prd3 = np.repeat(prd[..., None], 3, axis=-1)
        rows.append([img, tgt3, mix, prd3])
    grid = image_grid(rows)
    path = os.path.join(out_dir, f"{tag}.png")
    cv2.imwrite(path, cv2.cvtColor(grid, cv2.COLOR_RGB2BGR))
    return path
