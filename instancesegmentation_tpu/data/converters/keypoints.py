"""Keypoint-list -> common-format body_keypoint conversion.

Shared by the COCO and OCHuman converters (the reference duplicates
this helper in both, reference transfer_coco.py:12-93 and
transfer_ochuman.py:21-102; semantics identical here):

- 17 triplets  -> COCO part order, visibility {0: missing, 1: not_vis,
  2: vis} (reference transfer_coco.py:82-88),
- 19 triplets  -> OCHuman part order, visibility {0: missing, 1: vis,
  2/3 (self/others-occluded): not_vis} (transfer_ochuman.py:83-89).

Coordinates are truncated to int like the reference (ref :89).
"""
from __future__ import annotations

import numpy as np

from instancesegmentation_tpu.core.keys import (
    COCO_PART_NAMES,
    OCHUMAN_PART_NAMES,
    key_combine,
)

_KEY_MAP_17 = {0: "missing", 1: "not_vis", 2: "vis"}
_KEY_MAP_19 = {0: "missing", 1: "vis", 2: "not_vis", 3: "not_vis"}


def get_body_keypoint(kpt) -> dict:
    """Convert a flat [x, y, v] * N keypoint list (N in {17, 19})."""
    kpt = np.asarray(kpt, dtype=np.int32).reshape(-1, 3)
    npart = kpt.shape[0]
    if npart == 17:
        part_names, key_map = COCO_PART_NAMES, _KEY_MAP_17
    elif npart == 19:
        part_names, key_map = OCHUMAN_PART_NAMES, _KEY_MAP_19
    else:
        raise ValueError(f"unsupported keypoint count {npart} (need 17 or 19)")

    body_keypoint = {}
    for (x, y, v), name in zip(kpt, part_names):
        body_keypoint[key_combine(name, "sub_dict")] = {
            key_combine("status", "keypoint_status"): key_map[int(v)],
            key_combine("point", "point_xy"): [int(x), int(y)],
        }
    return body_keypoint
