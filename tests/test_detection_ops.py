"""Golden tests for the detection ops: RoI-Align, NMS, proposal matching."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instancesegmentation_tpu.ops.matching import (
    IGNORE,
    NEGATIVE,
    POSITIVE,
    match_proposals,
    subsample_labels,
)
from instancesegmentation_tpu.ops.nms import (
    batched_nms,
    box_iou_jnp,
    nms,
    nms_batch,
    nms_numpy,
)
from instancesegmentation_tpu.ops.roi_align import (
    roi_align,
    roi_align_numpy,
    roi_align_pallas,
)


# ---------------------------------------------------------------------------
# RoI-Align
# ---------------------------------------------------------------------------

def _roi_case(seed=0, n=2, h=24, w=32, c=5, r=6):
    rng = np.random.default_rng(seed)
    feats = rng.normal(size=(n, h, w, c)).astype(np.float32)
    x0 = rng.uniform(-2, w - 4, size=r)
    y0 = rng.uniform(-2, h - 4, size=r)
    bw = rng.uniform(2, w / 2, size=r)
    bh = rng.uniform(2, h / 2, size=r)
    boxes = np.stack([x0, y0, x0 + bw, y0 + bh], axis=-1).astype(np.float32)
    idx = rng.integers(0, n, size=r).astype(np.int32)
    return feats, boxes, idx


@pytest.mark.parametrize("aligned", [True, False])
@pytest.mark.parametrize("ratio", [1, 2])
def test_roi_align_matches_torchvision_algorithm(aligned, ratio):
    feats, boxes, idx = _roi_case()
    golden = roi_align_numpy(
        feats, boxes, idx, (7, 7), spatial_scale=0.5,
        sampling_ratio=ratio, aligned=aligned,
    )
    got = np.asarray(
        roi_align(
            jnp.asarray(feats), jnp.asarray(boxes), jnp.asarray(idx),
            (7, 7), spatial_scale=0.5, sampling_ratio=ratio, aligned=aligned,
        )
    )
    np.testing.assert_allclose(got, golden, atol=1e-4)


def test_roi_align_pallas_interpret_matches_xla():
    feats, boxes, idx = _roi_case(seed=3, c=8)
    x = np.asarray(
        roi_align(jnp.asarray(feats), jnp.asarray(boxes), jnp.asarray(idx), (7, 7))
    )
    p = np.asarray(
        roi_align_pallas(
            jnp.asarray(feats), jnp.asarray(boxes), jnp.asarray(idx), (7, 7),
            interpret=True,
        )
    )
    np.testing.assert_allclose(p, x, atol=1e-4)


def test_roi_align_whole_image_box_is_avgpoolish():
    # a box covering the whole map with output 1x1 approximates the mean
    feats = np.ones((1, 8, 8, 2), np.float32) * 3.0
    out = np.asarray(
        roi_align(
            jnp.asarray(feats), jnp.asarray([[0.0, 0.0, 8.0, 8.0]]),
            jnp.asarray([0]), (1, 1), sampling_ratio=4,
        )
    )
    np.testing.assert_allclose(out, np.full((1, 1, 1, 2), 3.0), atol=1e-5)


# ---------------------------------------------------------------------------
# NMS
# ---------------------------------------------------------------------------

def _nms_case(seed=0, n=64):
    rng = np.random.default_rng(seed)
    x0 = rng.uniform(0, 80, size=n)
    y0 = rng.uniform(0, 80, size=n)
    boxes = np.stack(
        [x0, y0, x0 + rng.uniform(5, 30, n), y0 + rng.uniform(5, 30, n)], -1
    ).astype(np.float32)
    scores = rng.uniform(0, 1, size=n).astype(np.float32)
    return boxes, scores


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.7])
def test_nms_matches_greedy_golden(seed, threshold):
    boxes, scores = _nms_case(seed)
    golden = nms_numpy(boxes, scores, threshold)
    idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), threshold)
    got = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(got, golden)


def test_nms_max_outputs_padding():
    boxes, scores = _nms_case(3, n=32)
    idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_outputs=5)
    assert idx.shape == (5,) and valid.shape == (5,)
    golden = nms_numpy(boxes, scores, 0.5)[:5]
    np.testing.assert_array_equal(np.asarray(idx)[np.asarray(valid)], golden)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.7])
def test_nms_pallas_matches_greedy_golden(seed, threshold):
    from instancesegmentation_tpu.ops.nms import nms_pallas

    boxes, scores = _nms_case(seed, n=96)
    golden = nms_numpy(boxes, scores, threshold)
    idx, valid = nms_pallas(
        jnp.asarray(boxes), jnp.asarray(scores), threshold, interpret=True
    )
    got = np.asarray(idx)[np.asarray(valid)]
    np.testing.assert_array_equal(got, golden)


def test_nms_pallas_max_outputs_and_score_threshold():
    from instancesegmentation_tpu.ops.nms import nms_pallas

    boxes, scores = _nms_case(7, n=32)
    idx, valid = nms_pallas(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_outputs=5,
        interpret=True,
    )
    assert idx.shape == (5,) and valid.shape == (5,)
    golden = nms_numpy(boxes, scores, 0.5)[:5]
    np.testing.assert_array_equal(np.asarray(idx)[np.asarray(valid)], golden)

    # score_threshold drops boxes before suppression, like nms()
    ref_i, ref_v = nms(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, score_threshold=0.5
    )
    got_i, got_v = nms_pallas(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, score_threshold=0.5,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(ref_i))
    np.testing.assert_array_equal(np.asarray(got_v), np.asarray(ref_v))


@pytest.mark.parametrize("allow_lq", [True, False])
@pytest.mark.parametrize("seed", [0, 4, 9])
def test_match_proposals_pallas_bit_equivalent(seed, allow_lq):
    from instancesegmentation_tpu.ops.matching import (
        match_proposals,
        match_proposals_pallas,
    )

    rng = np.random.default_rng(seed)
    iou = rng.uniform(0, 1, size=(48, 12)).astype(np.float32)
    # inject exact ties (argmax tie-breaking must match) and zero GTs
    iou[5] = iou[3]
    iou[:, 7] = 0.0
    ref_m, ref_l = match_proposals(jnp.asarray(iou),
                                   allow_low_quality=allow_lq)
    got_m, got_l = match_proposals_pallas(jnp.asarray(iou),
                                          allow_low_quality=allow_lq,
                                          interpret=True)
    np.testing.assert_array_equal(np.asarray(got_m), np.asarray(ref_m))
    np.testing.assert_array_equal(np.asarray(got_l), np.asarray(ref_l))


def test_batched_nms_classes_dont_suppress():
    boxes = np.asarray([[0, 0, 10, 10], [1, 1, 11, 11]], np.float32)
    scores = np.asarray([0.9, 0.8], np.float32)
    # same class: second suppressed
    idx, valid = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray([0, 0]), 0.5
    )
    assert int(valid.sum()) == 1
    # different classes: both kept
    idx, valid = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray([0, 1]), 0.5
    )
    assert int(valid.sum()) == 2


def test_nms_batch_vmap():
    boxes, scores = _nms_case(5, n=16)
    bb = jnp.stack([jnp.asarray(boxes)] * 3)
    ss = jnp.stack([jnp.asarray(scores)] * 3)
    idx, valid = nms_batch(bb, ss, 0.5)
    assert idx.shape == (3, 16)
    for k in range(3):
        np.testing.assert_array_equal(np.asarray(idx[k]), np.asarray(idx[0]))


# ---------------------------------------------------------------------------
# proposal matching
# ---------------------------------------------------------------------------

def test_match_proposals_thresholds():
    iou = jnp.asarray(
        [
            [0.9, 0.1],   # clear positive for gt0
            [0.4, 0.35],  # between -> ignore
            [0.1, 0.05],  # negative
        ]
    )
    matched, labels = match_proposals(iou, 0.5, 0.3, allow_low_quality=False)
    assert labels.tolist() == [POSITIVE, IGNORE, NEGATIVE]
    assert matched.tolist() == [0, 0, 0]


def test_match_low_quality_rescue():
    # gt1's best proposal only reaches 0.2 -> rescued as positive
    iou = jnp.asarray(
        [
            [0.9, 0.05],
            [0.1, 0.2],
        ]
    )
    _, labels_no = match_proposals(iou, 0.5, 0.3, allow_low_quality=False)
    assert labels_no.tolist() == [POSITIVE, NEGATIVE]
    matched, labels = match_proposals(iou, 0.5, 0.3, allow_low_quality=True)
    assert labels.tolist() == [POSITIVE, POSITIVE]
    assert matched.tolist() == [0, 1]


def test_subsample_labels_quota():
    rng = jax.random.PRNGKey(0)
    labels = jnp.asarray([POSITIVE] * 10 + [NEGATIVE] * 90)
    out = subsample_labels(labels, rng, batch_size=32, positive_fraction=0.25)
    assert int((out == POSITIVE).sum()) == 8
    assert int((out == NEGATIVE).sum()) == 24
    # with few positives, negatives fill the batch
    labels = jnp.asarray([POSITIVE] * 2 + [NEGATIVE] * 98)
    out = subsample_labels(labels, rng, batch_size=32, positive_fraction=0.25)
    assert int((out == POSITIVE).sum()) == 2
    assert int((out == NEGATIVE).sum()) == 30


def test_nms_max_outputs_contract():
    """Static-shape contract: k > n pads, k == 0 returns empty."""
    boxes, scores = _nms_case(7, n=10)
    idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_outputs=16)
    assert idx.shape == (16,) and valid.shape == (16,)
    golden = nms_numpy(boxes, scores, 0.5)
    np.testing.assert_array_equal(np.asarray(idx)[np.asarray(valid)], golden)
    assert not np.asarray(valid)[len(golden):].any()

    idx, valid = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_outputs=0)
    assert idx.shape == (0,) and valid.shape == (0,)


def test_fused_bottleneck_block_matches_reference():
    from instancesegmentation_tpu.ops.fused_block import (
        bottleneck3x3_fused,
        bottleneck3x3_reference,
    )

    rng = np.random.default_rng(0)
    n, h, w, c, p = 2, 16, 16, 48, 16
    mk = lambda *s: jnp.asarray((rng.normal(size=s) * 0.2).astype(np.float32))
    x = mk(n, h, w, c)
    args = (
        x, mk(c, p), mk(p), jnp.full((p,), 0.25), mk(3, 3, p), mk(p),
        jnp.full((p,), 0.25), mk(p, c), mk(c), jnp.full((c,), 0.25),
    )
    ref = np.asarray(bottleneck3x3_reference(*args))
    got = np.asarray(bottleneck3x3_fused(*args, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_nms_impl_auto_dispatch(monkeypatch):
    """NMS_IMPL='auto' picks the Pallas scan only on TPU backends (the
    measured winner, NMS_PROBE.json r4); the CPU test mesh gets the XLA
    scan (Mosaic doesn't lower on CPU); explicit overrides win."""
    from instancesegmentation_tpu.infer import proposals

    assert proposals._nms_impl() == "xla"  # conftest forces CPU
    monkeypatch.setattr(proposals, "NMS_IMPL", "pallas")
    assert proposals._nms_impl() == "pallas"
    monkeypatch.setattr(proposals, "NMS_IMPL", "xla")
    assert proposals._nms_impl() == "xla"
