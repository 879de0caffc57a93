"""Tests: record-level common_aug, debug helpers, proposal inference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instancesegmentation_tpu.core.augment import Affine, common_aug
from instancesegmentation_tpu.core.keys import key_combine
from instancesegmentation_tpu.utils.debug import check, model_summary


# ---------------------------------------------------------------------------
# Affine / common_aug
# ---------------------------------------------------------------------------

def test_affine_translate_matches_reference_semantics():
    img = np.zeros((10, 12, 3), np.uint8)
    img[2:4, 3:5] = 200
    t = Affine.translate(2, 1, (10, 12))
    out = t.apply_image(img)
    assert out[3, 5, 0] == 200 and out[2, 3, 0] == 0
    np.testing.assert_allclose(t.apply_points([[3, 2]]), [[5, 3]])
    assert t.apply_box([3, 2, 5, 4]) == [5.0, 3.0, 7.0, 5.0]


def test_affine_crop_resize_and_compose():
    # window [2,2,8,8) -> 6x6 resized to 12x12 (scale 2)
    a = Affine.crop_resize([2, 2, 8, 8], (12, 12))
    np.testing.assert_allclose(a.apply_points([[2, 2], [8, 8]]), [[0, 0], [12, 12]])
    # translate then crop == crop of translated coords
    t = Affine.translate(1, 0, (10, 10)).then(a)
    np.testing.assert_allclose(t.apply_points([[1, 2]]), [[0, 0]])


def test_affine_hflip():
    f = Affine.hflip((4, 6))
    np.testing.assert_allclose(f.apply_points([[0, 1]]), [[6, 1]])
    img = np.arange(24, dtype=np.uint8).reshape(4, 6)
    # hflip box keeps ordering
    assert f.apply_box([1, 0, 3, 2]) == [3.0, 0.0, 5.0, 2.0]


def test_common_aug_transforms_whole_record():
    img = np.zeros((20, 20, 3), np.uint8)
    img[5:10, 5:10] = 255
    mask = np.zeros((20, 20), np.uint8)
    mask[5:10, 5:10] = 255
    rec = {
        key_combine("image", "image"): img,
        key_combine("object", "sub_list"): [
            {
                key_combine("instance_mask", "mask"): mask,
                key_combine("box", "box_xyxy"): [5, 5, 10, 10],
                key_combine("body_keypoint", "sub_dict"): {
                    key_combine("nose", "sub_dict"): {
                        key_combine("point", "point_xy"): [7, 7],
                        key_combine("status", "keypoint_status"): "vis",
                    }
                },
            }
        ],
    }
    common_aug(rec, Affine.translate(3, 2, (20, 20)))
    obj = rec[key_combine("object", "sub_list")][0]
    assert obj[key_combine("box", "box_xyxy")] == [8.0, 7.0, 13.0, 12.0]
    assert obj[key_combine("body_keypoint", "sub_dict")][
        key_combine("nose", "sub_dict")
    ][key_combine("point", "point_xy")] == [10.0, 9.0]
    assert rec[key_combine("image", "image")][8, 9, 0] == 255
    assert obj[key_combine("instance_mask", "mask")][8, 9] == 255


# ---------------------------------------------------------------------------
# debug helpers
# ---------------------------------------------------------------------------

def test_check_and_model_summary(capsys):
    line = check(np.asarray([1.0, 2.0, np.nan]), "x")
    assert "nonfinite=1" in line and "shape=(3,)" in line
    params = {"layer1": {"kernel": np.zeros((3, 4))}, "layer2": {"b": np.zeros(5)}}
    table = model_summary(params)
    assert "layer1" in table and "12" in table and "TOTAL" in table and "17" in table


# ---------------------------------------------------------------------------
# proposal-based inference
# ---------------------------------------------------------------------------

def test_segment_proposals_pipeline():
    from instancesegmentation_tpu.infer.pipeline import InferenceEngine
    from instancesegmentation_tpu.infer.proposals import segment_proposals
    from instancesegmentation_tpu.models.segment import Segment

    model = Segment(in_channels=3, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    engine = InferenceEngine(variables, in_channels=3, size=64, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, size=(120, 160, 3), dtype=np.uint8)
    boxes = [
        [10, 10, 70, 90],     # object A
        [12, 12, 72, 92],     # near-duplicate of A -> suppressed
        [90, 20, 150, 100],   # object B
    ]
    scores = [0.9, 0.8, 0.7]
    results = segment_proposals(
        engine, image, boxes, scores, nms_threshold=0.5, canvas=192
    )
    assert len(results) == 2
    assert results[0]["box"] == boxes[0] and results[1]["box"] == boxes[2]
    for r in results:
        assert r["mask"].shape == (120, 160)
        assert r["mask"].dtype == np.uint8
        assert set(np.unique(r["mask"])) <= {0, 255}


def test_segment_proposals_empty():
    from instancesegmentation_tpu.infer.pipeline import InferenceEngine
    from instancesegmentation_tpu.infer.proposals import segment_proposals
    from instancesegmentation_tpu.models.segment import Segment

    model = Segment(in_channels=3, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    engine = InferenceEngine(variables, in_channels=3, size=64, dtype=jnp.float32)
    assert segment_proposals(engine, np.zeros((50, 50, 3), np.uint8), [], []) == []
