"""Proposal-based multi-instance inference.

Composes the standalone detection ops with the crop-and-segment model
(SURVEY.md §7 step 7: "an optional proposal-based inference mode that
composes them"): given an image and candidate person boxes (from any
detector, or GT boxes), the pipeline is

  batched NMS (device)  ->  per-proposal fused crop-warp  ->  Segment
  forward  ->  inverse-warp masks to the image frame

The reference segments "one object at a time" with dataset-provided
boxes; this mode turns that into a full-image multi-instance API with
device-side dedup.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from instancesegmentation_tpu.infer.pipeline import InferenceEngine
from instancesegmentation_tpu.ops.nms import nms


def segment_proposals(
    engine: InferenceEngine,
    image_rgb: np.ndarray,
    boxes: Sequence[Sequence[float]],
    scores: Sequence[float],
    nms_threshold: float = 0.7,
    max_instances: int = 16,
    canvas: int = 640,
) -> list[dict]:
    """Segment every surviving proposal of one image.

    Returns a list of ``{"box", "score", "mask_score", "mask"}`` dicts;
    masks are uint8 0/255 at the input image resolution.  ``score`` is
    the input proposal score; ``mask_score`` is the mean predicted
    probability inside the predicted mask (a real segmentation
    confidence for AP ranking, not a proxy).
    """
    import cv2

    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    scores = np.asarray(scores, np.float32).reshape(-1)
    if boxes.shape[0] == 0:
        return []

    idx, valid = nms(
        jnp.asarray(boxes), jnp.asarray(scores), nms_threshold,
        max_outputs=min(max_instances, boxes.shape[0]),
    )
    keep = np.asarray(idx)[np.asarray(valid)]
    if keep.size == 0:
        return []
    n_survived = int(np.asarray(valid).sum())
    if n_survived >= max_instances and boxes.shape[0] > max_instances:
        # no silent caps: the NMS output slot budget may be clipping
        # proposals that would otherwise survive
        print(
            f"segment_proposals: max_instances={max_instances} cap hit "
            f"({boxes.shape[0]} proposals in); raise max_instances if "
            "recall matters"
        )

    h, w = image_rgb.shape[:2]
    scale = 1.0
    img = image_rgb
    if max(h, w) > canvas:
        scale = canvas / max(h, w)
        img = cv2.resize(img, (int(w * scale), int(h * scale)))
    eh, ew = img.shape[:2]

    b = keep.size
    canvas_img = np.zeros((b, canvas, canvas, 3), dtype=np.uint8)
    canvas_img[:, :eh, :ew] = img[None]
    kept_boxes = boxes[keep] * scale

    batch = {
        "image": canvas_img,
        "mask": np.zeros((b, canvas, canvas), dtype=np.uint8),
        "image_hw": np.tile(np.asarray([eh, ew], np.float32), (b, 1)),
        # the proposal box is both the centering box and the crop window
        "obj_box": kept_boxes,
        "mask_box": kept_boxes,
        "mask_valid": np.ones((b,), bool),
        "keypoints": np.zeros((b, 17, 3), np.float32),  # unconditioned
    }
    crop_probs, canvas_masks = engine.predict_instances(batch)

    out = []
    for i, k in enumerate(keep):
        mask = canvas_masks[i, :eh, :ew]
        if scale != 1.0:
            mask = cv2.resize(mask, (w, h), interpolation=cv2.INTER_NEAREST)
        p = crop_probs[i, ..., 0]
        fg = p > engine.threshold
        mask_score = float(p[fg].mean()) if fg.any() else 0.0
        out.append(
            {
                "box": boxes[k].tolist(),
                "score": float(scores[k]),
                "mask_score": mask_score,
                "mask": mask,
            }
        )
    return out
