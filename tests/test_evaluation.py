"""Mask AP tests against hand-computed cases."""
import numpy as np
import pytest

from instancesegmentation_tpu.core.common import dict2class, mean, path_decompose
from instancesegmentation_tpu.core.evaluation import (
    average_precision,
    mask_ap,
    mask_iou_matrix,
    match_image,
    mean_mask_iou,
)


def _m(y0, y1, x0, x1, h=40, w=40):
    m = np.zeros((h, w), dtype=np.uint8)
    m[y0:y1, x0:x1] = 255
    return m


def test_iou_matrix():
    gt = [_m(0, 20, 0, 20)]
    pred = [_m(0, 20, 0, 20), _m(0, 20, 10, 30), _m(30, 40, 30, 40)]
    iou = mask_iou_matrix(pred, gt)
    assert iou[0, 0] == pytest.approx(1.0)
    assert iou[1, 0] == pytest.approx(200 / 600)
    assert iou[2, 0] == pytest.approx(0.0)


def test_match_greedy_by_score():
    # two preds overlap the same GT; the higher-scored one claims it
    gt = [_m(0, 20, 0, 20)]
    preds = [_m(0, 20, 0, 20), _m(0, 20, 0, 18)]
    iou = mask_iou_matrix(preds, gt)
    tp = match_image(iou, np.asarray([0.3, 0.9]), 0.5)
    assert tp.tolist() == [False, True]  # pred 1 has higher score
    tp = match_image(iou, np.asarray([0.9, 0.3]), 0.5)
    assert tp.tolist() == [True, False]


def test_average_precision_hand_case():
    # 2 GT total; predictions in score order: TP, FP, TP
    # recalls:    0.5, 0.5, 1.0
    # precisions: 1.0, 0.5, 2/3
    # envelope:   1.0, 2/3, 2/3
    # 101-pt: r<=0.5 -> 1.0 (51 pts), r>0.5 -> 2/3 (50 pts)
    tp = np.asarray([True, False, True])
    scores = np.asarray([0.9, 0.8, 0.7])
    ap = average_precision(tp, scores, num_gt=2)
    expect = (51 * 1.0 + 50 * (2 / 3)) / 101
    assert ap == pytest.approx(expect, abs=1e-9)


def test_perfect_predictions_ap_1():
    gts = [[_m(0, 20, 0, 20)], [_m(5, 25, 5, 25)]]
    preds = [
        {"masks": [_m(0, 20, 0, 20)], "scores": [0.9]},
        {"masks": [_m(5, 25, 5, 25)], "scores": [0.8]},
    ]
    res = mask_ap(preds, gts)
    assert res["AP"] == pytest.approx(1.0)
    assert res["AP50"] == pytest.approx(1.0)
    assert res["AP75"] == pytest.approx(1.0)


def test_partial_overlap_ap_threshold_behavior():
    # IoU 0.65 prediction (260/400): TP at 0.5, FP at 0.75
    gt = [[_m(0, 20, 0, 20)]]
    pred = [{"masks": [_m(0, 20, 0, 13)], "scores": [0.9]}]
    iou = mask_iou_matrix(pred[0]["masks"], gt[0])[0, 0]
    assert 0.5 < iou < 0.75
    res = mask_ap(pred, gt)
    assert res["AP50"] == pytest.approx(1.0)
    assert res["AP75"] == pytest.approx(0.0)


def test_no_predictions_and_no_gt():
    res = mask_ap([{"masks": [], "scores": []}], [[_m(0, 10, 0, 10)]])
    assert res["AP50"] == 0.0
    assert mean_mask_iou([_m(0, 10, 0, 10)], [_m(0, 10, 0, 10)]) == 1.0


def test_common_utils():
    ns = dict2class({"a": 1, "b": "x"})
    assert ns.a == 1 and ns.b == "x"
    assert path_decompose("/tmp/dir/file.png") == ("/tmp/dir", "file", "png")
    assert mean([1.0, 2.0, 3.0]) == 2.0
    assert mean(x for x in []) == 0.0


def test_mask_ap_rle_matches_bitmap_ap():
    from instancesegmentation_tpu.core.evaluation import mask_ap_rle
    from instancesegmentation_tpu.core.rasterize import rle_encode

    gts = [[_m(0, 20, 0, 20)], [_m(5, 25, 5, 25), _m(30, 40, 30, 40)]]
    preds = [
        {"masks": [_m(0, 20, 0, 20), _m(0, 20, 0, 13)], "scores": [0.9, 0.8]},
        {"masks": [_m(5, 25, 5, 25)], "scores": [0.7]},
    ]
    bitmap = mask_ap(preds, gts)
    rle_preds = [
        {"masks": [rle_encode(m) for m in p["masks"]], "scores": p["scores"]}
        for p in preds
    ]
    rle_gts = [[rle_encode(m) for m in g] for g in gts]
    rle = mask_ap_rle(rle_preds, rle_gts)
    assert rle["AP"] == pytest.approx(bitmap["AP"], abs=1e-9)
    assert rle["AP50"] == pytest.approx(bitmap["AP50"], abs=1e-9)
