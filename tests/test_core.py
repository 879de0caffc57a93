"""Unit tests for the core common-format library."""
import json
import os

import numpy as np
import pytest

from instancesegmentation_tpu.core import keys as K
from instancesegmentation_tpu.core import rasterize as R
from instancesegmentation_tpu.core.boxes import box_iou, mask2box
from instancesegmentation_tpu.core.masks import mask_iou, union_masks
from instancesegmentation_tpu.core.records import (
    ROOT_KEY,
    common_ann_loader,
    common_choice,
    common_filter,
    common_transfer,
    untyped_view,
)


# ---------------------------------------------------------------------------
# keys
# ---------------------------------------------------------------------------

def test_key_roundtrip():
    key = K.key_combine("box", "box_xyxy")
    assert key == "box##box_xyxy"
    assert K.key_decompose(key) == ("box", "box_xyxy")


def test_key_rejects_unknown_type():
    with pytest.raises(ValueError):
        K.key_combine("box", "nonsense")


def test_canonical_part_names():
    assert len(K.ORDER_PART_NAMES) == 17
    assert len(K.COCO_PART_NAMES) == 17
    assert len(K.OCHUMAN_PART_NAMES) == 19
    assert set(K.ORDER_PART_NAMES) == set(K.COCO_PART_NAMES)
    # the 17 canonical parts are the OCHuman list minus head/neck
    assert set(K.OCHUMAN_PART_NAMES) - set(K.ORDER_PART_NAMES) == {"head", "neck"}


# ---------------------------------------------------------------------------
# record ops
# ---------------------------------------------------------------------------

def _toy_record():
    return {
        K.key_combine("image", "image_path"): "image/a.png",
        K.key_combine("object", "sub_list"): [
            {
                K.key_combine("class", "class"): "person",
                K.key_combine("box", "box_xyxy"): [10, 20, 110, 220],
                K.key_combine("body_keypoint", "sub_dict"): {
                    K.key_combine("nose", "sub_dict"): {
                        K.key_combine("status", "keypoint_status"): "vis",
                        K.key_combine("point", "point_xy"): [50, 60],
                    }
                },
            }
        ],
        K.key_combine("meta", "other"): {"width": 320, "height": 240},
    }


def test_common_choice_keeps_chosen_names():
    rec = _toy_record()
    common_choice(rec, {"image", "object"})
    assert set(rec.keys()) == {
        K.key_combine("image", "image_path"),
        K.key_combine("object", "sub_list"),
    }


def test_untyped_view_strips_types_recursively():
    view = untyped_view(_toy_record())
    assert view["object"][0]["class"] == "person"
    assert view["object"][0]["body_keypoint"]["nose"]["status"] == "vis"


def test_common_filter_short_circuits():
    obj = untyped_view(_toy_record())["object"][0]

    def good(result):
        yield "box" in result
        x0, y0, x1, y1 = result["box"]
        yield (x1 - x0) > 50 and (y1 - y0) > 50

    def bad(result):
        yield "instance_mask" in result
        # must never run: previous condition already failed
        raise AssertionError("not short-circuited")

    rec = _toy_record()[K.key_combine("object", "sub_list")][0]
    assert common_filter(rec, good)
    assert not common_filter(rec, bad)


def test_loader_and_transfer_roundtrip(tmp_path):
    import cv2

    root = tmp_path / "ds"
    (root / "data").mkdir(parents=True)
    (root / "image").mkdir()
    (root / "instance_mask" / "a").mkdir(parents=True)

    img = np.zeros((8, 12, 3), dtype=np.uint8)
    img[:, :, 2] = 200  # red in RGB
    cv2.imwrite(str(root / "image" / "a.png"), img)  # file holds BGR
    mask = np.zeros((8, 12), dtype=np.uint8)
    mask[2:5, 3:7] = 255
    cv2.imwrite(str(root / "instance_mask" / "a" / "0.png"), mask)

    ann = {
        K.key_combine("image", "image_path"): "image/a.png",
        K.key_combine("object", "sub_list"): [
            {K.key_combine("instance_mask", "mask_path"): "instance_mask/a/0.png"}
        ],
    }
    (root / "data" / "a.json").write_text(json.dumps(ann))

    anns = list(common_ann_loader(str(root)))
    assert len(anns) == 1
    rec = anns[0]
    assert rec[ROOT_KEY] == str(root)

    common_transfer(rec)
    loaded_img = rec[K.key_combine("image", "image")]
    assert loaded_img.shape == (8, 12, 3)
    # loader converts BGR file content to RGB
    assert loaded_img[0, 0, 0] == 200 and loaded_img[0, 0, 2] == 0
    loaded_mask = rec[K.key_combine("object", "sub_list")][0][
        K.key_combine("instance_mask", "mask")
    ]
    assert loaded_mask.shape == (8, 12)
    assert mask2box(loaded_mask) == [3, 2, 7, 5]


# ---------------------------------------------------------------------------
# boxes / masks
# ---------------------------------------------------------------------------

def test_mask2box_full_and_empty():
    m = np.ones((4, 6), dtype=np.uint8) * 255
    assert mask2box(m) == [0, 0, 6, 4]
    assert mask2box(np.zeros((4, 6), dtype=np.uint8)) is None


def test_box_iou_known_values():
    a = np.array([[0, 0, 10, 10]])
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]])
    iou = box_iou(a, b)[0]
    assert iou[0] == pytest.approx(1.0)
    assert iou[1] == pytest.approx(25 / 175)
    assert iou[2] == pytest.approx(0.0)


def test_mask_iou_values():
    a = np.zeros((10, 10), dtype=np.uint8)
    b = np.zeros((10, 10), dtype=np.uint8)
    a[:5] = 255
    b[:5] = 255
    assert mask_iou(a, b) == pytest.approx(1.0)
    b[:] = 0
    b[5:] = 255
    assert mask_iou(a, b) == pytest.approx(0.0)
    b[:] = 255
    assert mask_iou(a, b) == pytest.approx(0.5)
    assert mask_iou(np.zeros((4, 4)), np.zeros((4, 4))) == 1.0


def test_union_masks():
    a = np.zeros((4, 4), dtype=np.uint8)
    b = np.zeros((4, 4), dtype=np.uint8)
    a[0, 0] = 255
    b[1, 1] = 255
    u = union_masks([a, b])
    assert u[0, 0] == 255 and u[1, 1] == 255 and u.sum() == 510


# ---------------------------------------------------------------------------
# rasterize / RLE
# ---------------------------------------------------------------------------

def test_polygon_rasterize_square():
    mask = R.polygons_to_mask([[2, 2, 8, 2, 8, 8, 2, 8]], 12, 12)
    assert mask.dtype == np.uint8
    assert mask[5, 5] == 255
    assert mask[0, 0] == 0
    # filled area close to the 7x7 inclusive square
    assert 36 <= (mask > 0).sum() <= 64


def test_rle_roundtrip_random():
    rng = np.random.default_rng(0)
    for _ in range(5):
        mask = (rng.random((17, 23)) > 0.7).astype(np.uint8) * 255
        rle = R.rle_encode(mask)
        assert sum(rle["counts"]) == 17 * 23
        np.testing.assert_array_equal(R.rle_decode(rle), mask)
        # compressed string roundtrip
        s = R.rle_to_string(rle)
        back = R.rle_from_string(s, 17, 23)
        assert back["counts"] == rle["counts"]


def test_rle_known_case():
    # column-major: first column all zeros, second all ones
    mask = np.zeros((3, 2), dtype=np.uint8)
    mask[:, 1] = 255
    rle = R.rle_encode(mask)
    assert rle["counts"] == [3, 3]
    assert R.rle_area(rle) == 3


def test_rle_starting_with_ones():
    mask = np.ones((2, 2), dtype=np.uint8) * 255
    rle = R.rle_encode(mask)
    assert rle["counts"] == [0, 4]


def test_segmentation_to_mask_all_flavors():
    mask = np.zeros((5, 7), dtype=np.uint8)
    mask[1:4, 2:6] = 255
    rle = R.rle_encode(mask)
    # uncompressed dict
    np.testing.assert_array_equal(R.segmentation_to_mask(rle, 5, 7), mask)
    # compressed dict
    compressed = {"size": [5, 7], "counts": R.rle_to_string(rle)}
    np.testing.assert_array_equal(R.segmentation_to_mask(compressed, 5, 7), mask)
    # polygon
    poly_mask = R.segmentation_to_mask([[2, 1, 5, 1, 5, 3, 2, 3]], 5, 7)
    assert poly_mask[2, 3] == 255


def test_rle_iou():
    a = np.zeros((6, 6), dtype=np.uint8)
    b = np.zeros((6, 6), dtype=np.uint8)
    a[:3] = 255
    b[:3] = 255
    assert R.rle_iou(R.rle_encode(a), R.rle_encode(b)) == 1.0
