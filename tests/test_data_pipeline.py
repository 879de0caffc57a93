"""Dataset/loader/preprocess tests over a synthetic common-format dataset."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instancesegmentation_tpu.data.dataset import InstanceCommonDataset
from instancesegmentation_tpu.data.pipeline import (
    AugmentConfig,
    _FLIP_PERM,
    batch_iterator,
    host_batch,
    preprocess_batch,
)
from instancesegmentation_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    make_synthetic_dataset(str(root), num_images=6, objects_per_image=2, seed=1)
    return InstanceCommonDataset(str(root), canvas=384)


def test_index_filter(ds):
    # 6 images x 2 objects, all eligible by construction
    assert len(ds) == 12


def test_fetch_shapes(ds):
    s = ds.fetch(0)
    assert s.image.shape == (384, 384, 3)
    assert s.mask.shape == (384, 384)
    assert s.keypoints.shape == (17, 3)
    assert s.mask_valid
    assert (s.keypoints[:, 2] == 1.0).all()
    # the mask content is inside the declared effective area
    h, w = s.image_hw.astype(int)
    assert s.mask[h:, :].sum() == 0 and s.mask[:, w:].sum() == 0


def test_flip_perm_is_involution():
    perm = np.asarray(_FLIP_PERM)
    assert (perm[perm] == np.arange(17)).all()
    # at least the wrists actually swap
    from instancesegmentation_tpu.core.keys import ORDER_PART_NAMES

    lw = ORDER_PART_NAMES.index("left_wrist")
    rw = ORDER_PART_NAMES.index("right_wrist")
    assert perm[lw] == rw and perm[rw] == lw
    assert perm[ORDER_PART_NAMES.index("nose")] == ORDER_PART_NAMES.index("nose")


def test_preprocess_batch_outputs(ds):
    batch = host_batch([ds.fetch(i) for i in range(4)])
    cfg = AugmentConfig(out_size=(96, 96))
    images, heatmaps, masks = jax.jit(
        lambda b, r: preprocess_batch(b, r, cfg)
    )(batch, jax.random.PRNGKey(0))
    assert images.shape == (4, 96, 96, 3)
    assert heatmaps.shape == (4, 96, 96, 17)
    assert masks.shape == (4, 96, 96, 1)
    images, heatmaps, masks = map(np.asarray, (images, heatmaps, masks))
    assert images.min() >= -1.0 and images.max() <= 1.0
    assert 0.0 <= masks.min() and masks.max() <= 1.0
    # object is centered and crop-tight: mask must occupy a large
    # central fraction but not the padded border
    inner = masks[:, 16:-16, 16:-16, 0]
    assert inner.mean() > 0.2
    # heatmaps peak near 1 where keypoints are visible
    assert heatmaps.max() > 0.95


def test_preprocess_out_dtype_value_identical(ds):
    """out_dtype=bf16 must equal the f32 pipeline followed by the model
    entry cast — bit-identical, since the cast merely moves from the
    first conv into the pipeline (pipeline.AugmentConfig.out_dtype)."""
    import jax.numpy as jnp

    batch = host_batch([ds.fetch(i) for i in range(2)])
    f32 = AugmentConfig(out_size=(32, 32))
    bf16 = AugmentConfig(out_size=(32, 32), out_dtype=jnp.bfloat16)
    i32, h32, m32 = preprocess_batch(batch, jax.random.PRNGKey(3), f32)
    i16, h16, m16 = preprocess_batch(batch, jax.random.PRNGKey(3), bf16)
    assert i16.dtype == h16.dtype == jnp.bfloat16
    assert m16.dtype == m32.dtype  # loss targets stay f32
    np.testing.assert_array_equal(
        np.asarray(i32.astype(jnp.bfloat16), np.float32), np.asarray(i16, np.float32)
    )
    np.testing.assert_array_equal(
        np.asarray(h32.astype(jnp.bfloat16), np.float32), np.asarray(h16, np.float32)
    )
    np.testing.assert_array_equal(np.asarray(m32), np.asarray(m16))


def test_preprocess_deterministic_without_augs(ds):
    batch = host_batch([ds.fetch(0)])
    cfg = AugmentConfig(out_size=(64, 64))
    a = preprocess_batch(batch, jax.random.PRNGKey(0), cfg)
    b = preprocess_batch(batch, jax.random.PRNGKey(9), cfg)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_preprocess_augs_vary_with_rng(ds):
    batch = host_batch([ds.fetch(0)])
    cfg = AugmentConfig(out_size=(64, 64), flip_prob=0.5, jitter=0.2, brightness=0.2)
    outs = [
        np.asarray(preprocess_batch(batch, jax.random.PRNGKey(k), cfg)[0])
        for k in range(4)
    ]
    assert any(not np.allclose(outs[0], o) for o in outs[1:])


def test_flip_consistency_image_mask_heatmap(ds):
    """With flip_prob=1 the output must equal the unflipped output
    mirrored, with left/right heatmap channels swapped."""
    batch = host_batch([ds.fetch(2)])
    plain = AugmentConfig(out_size=(64, 64))
    flip = AugmentConfig(out_size=(64, 64), flip_prob=1.0)
    img0, hm0, m0 = map(np.asarray, preprocess_batch(batch, jax.random.PRNGKey(0), plain))
    img1, hm1, m1 = map(np.asarray, preprocess_batch(batch, jax.random.PRNGKey(0), flip))
    np.testing.assert_allclose(img1, img0[:, :, ::-1], atol=1e-5)
    np.testing.assert_allclose(m1, m0[:, :, ::-1], atol=1e-5)
    perm = np.asarray(_FLIP_PERM)
    # x-mirror of keypoints uses the point convention; allow 1px shift
    mirrored = hm0[:, :, ::-1][:, :, :, perm]
    # peaks should land within a pixel of each other
    for k in range(17):
        p1 = np.unravel_index(hm1[0, :, :, k].argmax(), (64, 64))
        p0 = np.unravel_index(mirrored[0, :, :, k].argmax(), (64, 64))
        assert abs(p1[0] - p0[0]) <= 1 and abs(p1[1] - p0[1]) <= 1


def test_batch_iterator_epochs_and_shapes(ds):
    n = 0
    for batch in batch_iterator(ds, batch_size=4, shuffle=True, epochs=2, seed=3):
        assert batch["image"].shape == (4, 384, 384, 3)
        n += 1
    assert n == 2 * (len(ds) // 4)


def test_batch_iterator_pad_last(ds):
    batches = list(
        batch_iterator(ds, batch_size=5, shuffle=False, epochs=1, drop_last=False)
    )
    assert len(batches) == 3  # 12 samples -> 5,5,2->padded 5
    assert batches[-1]["image"].shape[0] == 5


def test_crossed_pairs_generator(tmp_path):
    """Crossed-pair mode (keypoint-conditioning stress case): both
    instances share ONE bounding box and color, overlap only partially,
    and every keypoint lies inside its own instance mask — so the crop
    geometry carries no information about the target and only the
    keypoints disambiguate."""
    import cv2
    import os

    from instancesegmentation_tpu.core.keys import key_combine
    from instancesegmentation_tpu.core.records import ROOT_KEY, common_ann_loader
    from instancesegmentation_tpu.data.dataset import (
        InstanceCommonDataset,
        body_keypoint_array,
    )

    d = str(tmp_path / "crossed")
    make_synthetic_dataset(d, num_images=3, seed=17, crossed_pairs=True)
    k_objs = key_combine("object", "sub_list")
    k_mask = key_combine("instance_mask", "mask_path")
    k_box = key_combine("box", "box_xyxy")
    k_body = key_combine("body_keypoint", "sub_dict")
    n_imgs = 0
    for ann in common_ann_loader(d):
        root = ann[ROOT_KEY]
        masks, boxes = [], []
        for obj in ann[k_objs]:
            m = cv2.imread(os.path.join(root, obj[k_mask]), cv2.IMREAD_GRAYSCALE)
            kp = body_keypoint_array(obj.get(k_body))
            assert (kp[:, 2] == 1.0).all()
            for x, y, _ in kp:
                assert m[int(y), int(x)] > 0, "keypoint outside own mask"
            masks.append(m > 0)
            boxes.append(obj[k_box])
        assert boxes[0] == boxes[1], "pair must share one box"
        inter = np.logical_and(*masks).sum()
        union = np.logical_or(*masks).sum()
        assert 0.05 < inter / union < 0.6, "pair overlap out of range"
        n_imgs += 1
    assert n_imgs == 3
    # every instance passes the reference eligibility filter
    assert len(InstanceCommonDataset(d)) == 6
