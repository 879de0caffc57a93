"""Host-side record-level geometric augmentation (``common_aug``).

Completes the reconstructed ymlib record-operator surface (SURVEY.md
§2.8): apply ONE geometric transform consistently to every image, mask,
box and keypoint of a common-format record, recursing into sub_list /
sub_dict values — the role ``common_aug(record, iaa_augmenter)`` plays
at reference train_instance.py:158,196 and tool/show_aug.py:72,99.

Deviation by design: imgaug is not a dependency here; transforms are
explicit 2x3 affines (``Affine``), which cover everything the reference
actually used (translate / crop+pad / resize / flip; rotation existed
only commented-out).  The TRAINING path never calls this — it fuses the
same geometry device-side (ops/warp.py); this operator exists for host
tooling, converters and API parity.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from instancesegmentation_tpu.core.keys import key_decompose


@dataclasses.dataclass(frozen=True)
class Affine:
    """2x3 affine ``dst(x, y) = M @ [x, y, 1]`` with an output size."""

    matrix: np.ndarray  # [2, 3] float64
    out_hw: tuple[int, int]

    # -- constructors ----------------------------------------------------
    @staticmethod
    def identity(out_hw) -> "Affine":
        return Affine(np.asarray([[1, 0, 0], [0, 1, 0]], np.float64), tuple(out_hw))

    @staticmethod
    def translate(tx: float, ty: float, out_hw) -> "Affine":
        """iaa.Affine(translate_px) semantics: canvas size unchanged,
        out-of-canvas content cut, vacated area black."""
        return Affine(np.asarray([[1, 0, tx], [0, 1, ty]], np.float64), tuple(out_hw))

    @staticmethod
    def crop_resize(window_xyxy, out_hw) -> "Affine":
        """iaa.CropAndPad(...) + iaa.Resize semantics: map the (possibly
        out-of-canvas) window onto the output rectangle."""
        x0, y0, x1, y1 = [float(v) for v in window_xyxy]
        oh, ow = out_hw
        sx = ow / (x1 - x0)
        sy = oh / (y1 - y0)
        return Affine(
            np.asarray([[sx, 0, -x0 * sx], [0, sy, -y0 * sy]], np.float64),
            tuple(out_hw),
        )

    @staticmethod
    def rotate(degrees: float, out_hw) -> "Affine":
        """``iaa.Affine(rotate=deg)`` semantics: rotate around the image
        center ``(w/2 - 0.5, h/2 - 0.5)``, canvas size unchanged, content
        leaving the canvas cut, vacated area black — the reference's
        commented-out ±25° aug (train_instance.py:153-155), offered as
        an enabled option.  Positive angles use the skimage/imgaug
        rotation matrix ``[[c, -s], [s, c]]`` on (x, y)."""
        import math

        oh, ow = out_hw
        th = math.radians(degrees)
        c, s = math.cos(th), math.sin(th)
        cx, cy = ow / 2.0 - 0.5, oh / 2.0 - 0.5
        return Affine(
            np.asarray(
                [
                    [c, -s, cx - c * cx + s * cy],
                    [s, c, cy - s * cx - c * cy],
                ],
                np.float64,
            ),
            tuple(out_hw),
        )

    @staticmethod
    def hflip(out_hw) -> "Affine":
        oh, ow = out_hw
        return Affine(np.asarray([[-1, 0, ow], [0, 1, 0]], np.float64), tuple(out_hw))

    # -- algebra ---------------------------------------------------------
    def then(self, other: "Affine") -> "Affine":
        """self followed by other (matrix composition)."""
        a = np.vstack([self.matrix, [0, 0, 1]])
        b = np.vstack([other.matrix, [0, 0, 1]])
        return Affine((b @ a)[:2], other.out_hw)

    # -- application -----------------------------------------------------
    def apply_image(self, image: np.ndarray) -> np.ndarray:
        """Warp an image or mask array (bilinear, constant-black border —
        masks interpolate like the training pipeline's soft targets)."""
        import cv2

        oh, ow = self.out_hw
        return cv2.warpAffine(
            image,
            self.matrix.astype(np.float32),
            (ow, oh),
            flags=cv2.INTER_LINEAR,
            borderMode=cv2.BORDER_CONSTANT,
            borderValue=0,
        )

    def apply_points(self, points_xy: np.ndarray) -> np.ndarray:
        pts = np.asarray(points_xy, np.float64).reshape(-1, 2)
        out = pts @ self.matrix[:, :2].T + self.matrix[:, 2]
        return out.reshape(np.shape(points_xy))

    def apply_box(self, box_xyxy) -> list[float]:
        x0, y0, x1, y1 = [float(v) for v in box_xyxy]
        corners = self.apply_points(
            np.asarray([[x0, y0], [x1, y0], [x0, y1], [x1, y1]])
        )
        return [
            float(corners[:, 0].min()), float(corners[:, 1].min()),
            float(corners[:, 0].max()), float(corners[:, 1].max()),
        ]


def common_aug(record: dict, affine: Affine) -> None:
    """Apply ``affine`` to every geometric leaf of ``record``, in place.

    Transforms ``*##image`` / ``*##mask`` arrays, ``*##box_xyxy`` boxes
    and ``point##point_xy`` keypoints; recurses through sub_list /
    sub_dict.  Path-typed entries are untouched (re-run
    ``common_transfer`` + ``common_aug`` to re-derive them).
    """
    for key in list(record.keys()):
        name, key_type = key_decompose(key)
        value = record[key]
        if key_type in ("image", "mask"):
            record[key] = affine.apply_image(value)
        elif key_type == "box_xyxy":
            record[key] = affine.apply_box(value)
        elif key_type == "point_xy":
            record[key] = [float(v) for v in affine.apply_points(value)]
        elif key_type == "sub_list":
            for sub in value:
                if isinstance(sub, dict):
                    common_aug(sub, affine)
        elif key_type == "sub_dict":
            if isinstance(value, dict):
                common_aug(value, affine)
