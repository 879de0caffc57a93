"""Drawing helpers for masks, boxes, keypoints and labels.

Replaces ``ymlib.dataset_visual`` (reference usage: train_instance.py:18,
441-444; tool/show_aug.py:2,107-116).  All functions draw in place on
RGB uint8 HWC images.  These feed offline artifact dumps — the TPU build
has no ``cv.imshow`` dependency (reference bug §2.3.4).
"""
from __future__ import annotations

import numpy as np

from instancesegmentation_tpu.core.keys import key_combine, key_decompose

DEFAULT_COLORS = (
    (255, 0, 0), (255, 255, 0), (0, 255, 0),
    (0, 255, 255), (0, 0, 255), (255, 0, 255),
)


def draw_mask(image: np.ndarray, mask: np.ndarray, color=(0, 255, 0), alpha: float = 0.5) -> np.ndarray:
    """Alpha-blend ``color`` over pixels where ``mask > 127``."""
    sel = mask > 127
    overlay = np.asarray(color, dtype=np.float32)
    image[sel] = (image[sel].astype(np.float32) * (1 - alpha) + overlay * alpha).astype(np.uint8)
    return image


def draw_box(image: np.ndarray, box, color=(255, 0, 0), thickness: int = 2) -> np.ndarray:
    """Draw an xyxy box outline."""
    import cv2

    if box is None:
        return image
    x0, y0, x1, y1 = [int(round(v)) for v in box]
    cv2.rectangle(image, (x0, y0), (x1 - 1, y1 - 1), color, thickness)
    return image


def draw_label(image: np.ndarray, text: str, origin, color=(255, 255, 255), thickness: int = 1, scale: float = 0.6) -> np.ndarray:
    """Draw a text label with its top-left corner at ``origin``."""
    import cv2

    x, y = int(origin[0]), int(origin[1])
    cv2.putText(image, str(text), (x, y + 14), cv2.FONT_HERSHEY_SIMPLEX, scale, color, thickness, cv2.LINE_AA)
    return image


def draw_keypoint(image: np.ndarray, body_keypoint: dict, labeled: bool = False, radius: int = 3) -> np.ndarray:
    """Draw a common-format ``body_keypoint`` sub_dict.

    Visible points are green, occluded (not_vis) orange; missing points
    are skipped.
    """
    import cv2

    status_key = key_combine("status", "keypoint_status")
    point_key = key_combine("point", "point_xy")
    for key, kp in body_keypoint.items():
        name, key_type = key_decompose(key)
        if key_type != "sub_dict" or not isinstance(kp, dict):
            continue
        status = kp.get(status_key, "missing")
        if status == "missing":
            continue
        x, y = kp[point_key]
        color = (0, 255, 0) if status == "vis" else (255, 165, 0)
        cv2.circle(image, (int(x), int(y)), radius, color, -1)
        if labeled:
            draw_label(image, name, (x + radius, y - radius), color=color, scale=0.35)
    return image


def image_grid(rows) -> np.ndarray:
    """Stack a list of rows (each a list of same-height HWC images) into one image."""
    return np.concatenate([np.concatenate(list(r), axis=1) for r in rows], axis=0)
