"""Converter round-trip tests: synthetic source -> common format ->
loadable by the training dataset."""
import base64
import json
import os
import zlib

import numpy as np
import pytest

from instancesegmentation_tpu.core.keys import key_combine
from instancesegmentation_tpu.core.rasterize import rle_encode, rle_to_string
from instancesegmentation_tpu.core.records import common_ann_loader, common_transfer
from instancesegmentation_tpu.data.converters import (
    migrate_class_keys,
    transfer_coco,
    transfer_ochuman,
    transfer_supervisely_to_common,
)
from instancesegmentation_tpu.data.dataset import InstanceCommonDataset


def _write_image(path, h=120, w=160, seed=0):
    import cv2

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)
    cv2.imwrite(path, img)
    return img


def _kpts17(x0, y0, visible=2):
    flat = []
    for i in range(17):
        flat += [x0 + 3 * i, y0 + 2 * i, visible]
    return flat


# ---------------------------------------------------------------------------
# COCO
# ---------------------------------------------------------------------------

def test_transfer_coco(tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    _write_image(str(img_dir / "0001.jpg"))

    # one polygon ann + one compressed-RLE ann
    mask = np.zeros((120, 160), dtype=np.uint8)
    mask[20:80, 30:90] = 255
    rle = rle_encode(mask)
    coco = {
        "categories": [{"id": 1, "name": "person"}, {"id": 2, "name": "cat"}],
        "images": [{"id": 10, "file_name": "0001.jpg", "height": 120, "width": 160}],
        "annotations": [
            {
                "id": 1, "image_id": 10, "category_id": 1,
                "bbox": [30, 20, 60, 60],
                "segmentation": [[30, 20, 89, 20, 89, 79, 30, 79]],
                "keypoints": _kpts17(35, 25),
            },
            {
                "id": 2, "image_id": 10, "category_id": 1,
                "bbox": [5, 5, 60, 70],
                "segmentation": {"size": [120, 160], "counts": rle_to_string(rle)},
                "keypoints": _kpts17(10, 10, visible=0),
            },
            {   # non-person: must be skipped
                "id": 3, "image_id": 10, "category_id": 2,
                "bbox": [0, 0, 10, 10], "segmentation": [[0, 0, 9, 0, 9, 9]],
                "keypoints": None,
            },
        ],
    }
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(coco))

    out = tmp_path / "common"
    n = transfer_coco(str(img_dir), str(ann_path), str(out), progress=False)
    assert n == 1

    anns = list(common_ann_loader(str(out)))
    assert len(anns) == 1
    rec = anns[0]
    objs = rec[key_combine("object", "sub_list")]
    assert len(objs) == 2  # cat skipped
    # +1 xyxy quirk
    assert objs[0][key_combine("box", "box_xyxy")] == [30, 20, 91, 81]
    # keypoint visibility mapping
    body = objs[0][key_combine("body_keypoint", "sub_dict")]
    nose = body[key_combine("nose", "sub_dict")]
    assert nose[key_combine("status", "keypoint_status")] == "vis"
    body2 = objs[1][key_combine("body_keypoint", "sub_dict")]
    nose2 = body2[key_combine("nose", "sub_dict")]
    assert nose2[key_combine("status", "keypoint_status")] == "missing"

    # masks decode and the RLE one matches the source bitmap
    common_transfer(rec)
    m1 = objs[1][key_combine("instance_mask", "mask")]
    np.testing.assert_array_equal(m1, mask)

    # the converted dir is loadable by the training dataset (first obj
    # eligible: polygon mask 60x61 box, 17 vis keypoints)
    ds = InstanceCommonDataset(str(out))
    assert len(ds) == 1


# ---------------------------------------------------------------------------
# OCHuman
# ---------------------------------------------------------------------------

def test_transfer_ochuman(tmp_path):
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    _write_image(str(img_dir / "a.jpg"))

    kpt19 = []
    for i in range(19):
        kpt19 += [40 + 2 * i, 30 + 2 * i, 1 if i < 12 else 3]  # 3 -> not_vis
    och = {
        "images": [
            {
                "file_name": "a.jpg", "width": 160, "height": 120,
                "annotations": [
                    {
                        "bbox": [30, 20, 100, 95],
                        "keypoints": kpt19,
                        "segms": {
                            "outer": [[30, 20, 99, 20, 99, 94, 30, 94]],
                            "inner": [[50, 40, 60, 40, 60, 50, 50, 50]],
                        },
                    }
                ],
            }
        ]
    }
    ann_path = tmp_path / "och.json"
    ann_path.write_text(json.dumps(och))
    out = tmp_path / "common"
    n = transfer_ochuman(str(ann_path), str(img_dir), str(out), progress=False)
    assert n == 1

    rec = list(common_ann_loader(str(out)))[0]
    obj = rec[key_combine("object", "sub_list")][0]
    assert obj[key_combine("box", "box_xyxy")] == [30, 20, 100, 95]
    body = obj[key_combine("body_keypoint", "sub_dict")]
    # occlusion flag 3 -> not_vis (ears etc. are the tail parts)
    eye = body[key_combine("left_eye", "sub_dict")]
    assert eye[key_combine("status", "keypoint_status")] == "not_vis"
    shoulder = body[key_combine("right_shoulder", "sub_dict")]
    assert shoulder[key_combine("status", "keypoint_status")] == "vis"

    common_transfer(rec)
    m = obj[key_combine("instance_mask", "mask")]
    assert m[30, 40] == 255       # inside outer
    assert m[45, 55] == 0         # inside inner hole
    ds = InstanceCommonDataset(str(out))
    assert len(ds) == 1


# ---------------------------------------------------------------------------
# Supervisely
# ---------------------------------------------------------------------------

def test_transfer_supervisely(tmp_path):
    import cv2

    proj = tmp_path / "proj" / "ds0"
    (proj / "ann").mkdir(parents=True)
    (proj / "img").mkdir()
    _write_image(str(proj / "img" / "item1.png"))

    # a bitmap person: 40x50 patch at origin (30, 20)
    patch = np.full((50, 40), 255, dtype=np.uint8)
    ok, png = cv2.imencode(".png", patch)
    assert ok
    bitmap_data = base64.b64encode(zlib.compress(png.tobytes())).decode()

    sann = {
        "size": {"height": 120, "width": 160},
        "objects": [
            {
                "classTitle": "person_bmp",
                "geometryType": "bitmap",
                "instance": "A",
                "bitmap": {"data": bitmap_data, "origin": [30, 20]},
            },
            {
                "classTitle": "nose",
                "geometryType": "point",
                "instance": "A",
                "points": {"exterior": [[45, 35]], "interior": []},
            },
            {
                "classTitle": "person_poly",
                "geometryType": "polygon",
                "instance": "B",
                "points": {
                    "exterior": [[100, 60], [150, 60], [150, 110], [100, 110]],
                    "interior": [],
                },
            },
            {
                "classTitle": "neutral",
                "geometryType": "polygon",
                "instance": "C",
                "points": {"exterior": [[0, 0], [5, 0], [5, 5]], "interior": []},
            },
        ],
    }
    (proj / "ann" / "item1.json").write_text(json.dumps(sann))

    out = tmp_path / "common"
    n = transfer_supervisely_to_common(str(tmp_path / "proj"), str(out), progress=False)
    assert n == 1

    rec = list(common_ann_loader(str(out)))[0]
    objs = rec[key_combine("object", "sub_list")]
    # neutral skipped but creates no instance; A and B remain... C had
    # only a skipped label -> entry exists with only empty keypoints;
    # the dataset filter would drop it, the converter keeps parity with
    # the reference's objs dict behavior
    with_mask = [o for o in objs if key_combine("instance_mask", "mask_path") in o]
    assert len(with_mask) == 2
    a = next(o for o in with_mask if key_combine("body_keypoint", "sub_dict") in o
             and o[key_combine("body_keypoint", "sub_dict")])
    body = a[key_combine("body_keypoint", "sub_dict")]
    nose = body[key_combine("nose", "sub_dict")]
    assert nose[key_combine("point", "point_xy")] == [45, 35]
    # inclusive bbox of the bitmap patch
    assert a[key_combine("box", "box_xyxy")] == [30, 20, 69, 69]

    common_transfer(rec)
    m = a[key_combine("instance_mask", "mask")]
    assert m[25, 35] == 255 and m[10, 10] == 0


def test_supervisely_class_whitelist(tmp_path):
    proj = tmp_path / "proj" / "ds0"
    (proj / "ann").mkdir(parents=True)
    (proj / "img").mkdir()
    _write_image(str(proj / "img" / "x.png"))
    sann = {"objects": [{"classTitle": "car", "geometryType": "polygon",
                         "points": {"exterior": [[0, 0], [1, 0], [1, 1]]}}]}
    (proj / "ann" / "x.json").write_text(json.dumps(sann))
    with pytest.raises(AssertionError, match="not support"):
        transfer_supervisely_to_common(str(tmp_path / "proj"), str(tmp_path / "o"))


# ---------------------------------------------------------------------------
# migration
# ---------------------------------------------------------------------------

def test_migrate_class_keys(tmp_path):
    data = tmp_path / "data"
    data.mkdir()
    old = {
        key_combine("class", "other"): "person",
        key_combine("object", "sub_list"): [
            {key_combine("class", "other"): "person"}
        ],
        key_combine("class_mask", "sub_list"): [
            {key_combine("class", "other"): "person"}
        ],
    }
    (data / "a.json").write_text(json.dumps(old))
    assert migrate_class_keys(str(tmp_path)) == 1
    new = json.loads((data / "a.json").read_text())
    assert new[key_combine("class", "class")] == "person"
    assert key_combine("class", "other") not in new
    assert new[key_combine("object", "sub_list")][0][key_combine("class", "class")] == "person"
    # idempotent
    assert migrate_class_keys(str(tmp_path)) == 0
