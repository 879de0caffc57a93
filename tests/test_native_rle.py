"""Native C++ RLE codec vs the NumPy reference implementation."""
import numpy as np
import pytest

from instancesegmentation_tpu.core import rasterize as R
from instancesegmentation_tpu.ops.native.build import (
    load_native,
    rle_decode_native,
    rle_encode_native,
    rle_iou_matrix_native,
    rle_iou_native,
)

pytestmark = pytest.mark.skipif(
    load_native() is None, reason="no C++ toolchain available"
)


def _random_masks(k=6, h=37, w=53, seed=0):
    rng = np.random.default_rng(seed)
    return [
        (rng.random((h, w)) > rng.uniform(0.3, 0.9)).astype(np.uint8) * 255
        for _ in range(k)
    ]


def test_encode_matches_numpy():
    for mask in _random_masks():
        np_rle = R.rle_encode(mask)
        c_rle = rle_encode_native(mask)
        assert c_rle["counts"] == np_rle["counts"]
        assert c_rle["size"] == np_rle["size"]


def test_decode_matches_numpy():
    for mask in _random_masks(seed=1):
        rle = R.rle_encode(mask)
        c_mask = rle_decode_native(rle)
        np.testing.assert_array_equal(c_mask, mask)


def test_empty_and_full():
    empty = np.zeros((8, 9), np.uint8)
    full = np.full((8, 9), 255, np.uint8)
    assert rle_encode_native(empty)["counts"] == [72]
    assert rle_encode_native(full)["counts"] == [0, 72]
    np.testing.assert_array_equal(rle_decode_native(R.rle_encode(full)), full)


def test_iou_matches_decoded():
    masks = _random_masks(k=4, seed=2)
    rles = [R.rle_encode(m) for m in masks]
    for i in range(4):
        for j in range(4):
            got = rle_iou_native(rles[i], rles[j])
            a = masks[i] > 0
            b = masks[j] > 0
            union = np.logical_or(a, b).sum()
            expect = 1.0 if union == 0 else np.logical_and(a, b).sum() / union
            assert got == pytest.approx(expect, abs=1e-12)


def test_iou_matrix_matches_pairwise():
    masks = _random_masks(k=5, seed=3)
    rles = [R.rle_encode(m) for m in masks]
    mat = rle_iou_matrix_native(rles[:3], rles[3:])
    assert mat.shape == (3, 2)
    for i in range(3):
        for j in range(2):
            assert mat[i, j] == pytest.approx(
                rle_iou_native(rles[i], rles[3 + j]), abs=1e-12
            )


def test_both_empty_iou_is_one():
    e = R.rle_encode(np.zeros((5, 5), np.uint8))
    assert rle_iou_native(e, e) == 1.0
