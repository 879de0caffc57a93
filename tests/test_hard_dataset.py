"""make_hard_dataset: the OCHuman-analog crowded/occluded benchmark
generator (VERDICT r3 next#5) — schema conformance and the difficulty
properties it exists to provide."""
import json
import os

import numpy as np
import pytest

from instancesegmentation_tpu.core.keys import ORDER_PART_NAMES, key_combine
from instancesegmentation_tpu.data.dataset import InstanceCommonDataset
from instancesegmentation_tpu.data.synthetic import make_hard_dataset

K_OBJS = key_combine("object", "sub_list")
K_MASK = key_combine("instance_mask", "mask_path")
K_BOX = key_combine("box", "box_xyxy")
K_BODY = key_combine("body_keypoint", "sub_dict")
K_STATUS = key_combine("status", "keypoint_status")


@pytest.fixture(scope="module")
def hard(tmp_path_factory):
    root = tmp_path_factory.mktemp("hard")
    make_hard_dataset(str(root), num_images=12, image_hw=(240, 320), seed=3)
    return str(root)


def _anns(root):
    import glob

    for p in sorted(glob.glob(os.path.join(root, "data", "*.json"))):
        with open(p) as f:
            yield json.load(f)


def test_schema_and_loadable(hard):
    anns = list(_anns(hard))
    assert len(anns) == 12
    for ann in anns:
        for obj in ann[K_OBJS]:
            assert os.path.exists(os.path.join(hard, obj[K_MASK]))
            x0, y0, x1, y1 = obj[K_BOX]
            assert x1 > x0 and y1 > y0
    # the training dataset ingests it (its filter may drop small or
    # keypoint-poor instances — that is the intended difficulty)
    ds = InstanceCommonDataset(hard, canvas=320)
    assert len(ds) > 0
    s = ds.fetch(0)
    assert s.image.shape == (320, 320, 3)


def test_crowding_occlusion_and_scale_range(hard):
    import cv2

    n_objs = []
    statuses = {"vis": 0, "not_vis": 0, "missing": 0}
    heights = []
    any_overlapping_boxes = 0
    for ann in _anns(hard):
        objs = ann[K_OBJS]
        n_objs.append(len(objs))
        boxes = [o[K_BOX] for o in objs]
        for i in range(len(boxes)):
            for j in range(i + 1, len(boxes)):
                ax0, ay0, ax1, ay1 = boxes[i]
                bx0, by0, bx1, by1 = boxes[j]
                ix = max(0, min(ax1, bx1) - max(ax0, bx0))
                iy = max(0, min(ay1, by1) - max(ay0, by0))
                if ix > 0 and iy > 0:
                    any_overlapping_boxes += 1
        for o in objs:
            heights.append(o[K_BOX][3] - o[K_BOX][1])
            for part in ORDER_PART_NAMES:
                kp = o[K_BODY][key_combine(part, "sub_dict")]
                statuses[kp[K_STATUS]] += 1
            # visible masks: instances must not overlap each other
        masks = [
            cv2.imread(os.path.join(hard, o[K_MASK]), cv2.IMREAD_GRAYSCALE)
            for o in objs
        ]
        stack = np.stack([m > 0 for m in masks])
        assert int(stack.sum(0).max()) <= 1, "visible masks must be disjoint"

    assert min(n_objs) >= 2  # >=3 generated; near-total occlusion may drop one
    assert max(n_objs) >= 4
    assert any_overlapping_boxes >= len(n_objs), "crowding: boxes must overlap"
    # all three keypoint regimes present, occlusion substantial
    assert statuses["vis"] > 0 and statuses["missing"] > 0
    assert statuses["not_vis"] > 30, statuses
    # >=4x scale range across the set
    assert max(heights) / max(min(heights), 1) >= 4.0, (min(heights), max(heights))


def test_non_missing_keypoints_are_on_canvas(hard):
    """Regression: coordinates in (-1, 0) must be 'missing', not clamped
    to row/col 0 by int() truncation — every stored (non-missing) point
    lies strictly on canvas."""
    h, w = 240, 320
    n_checked = 0
    for ann in _anns(hard):
        for o in ann[K_OBJS]:
            for part in ORDER_PART_NAMES:
                kp = o[K_BODY][key_combine(part, "sub_dict")]
                if kp[K_STATUS] == "missing":
                    assert key_combine("point", "point_xy") not in kp
                    continue
                x, y = kp[key_combine("point", "point_xy")]
                assert 0 <= x < w and 0 <= y < h, (part, x, y)
                n_checked += 1
    assert n_checked > 100  # the invariant actually got exercised
