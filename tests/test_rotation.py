"""Golden tests for the rotation augmentation (the reference's
commented-out ±25° aug, train_instance.py:153-155, enabled as an
option): host oracle ``core.augment.Affine.rotate`` vs cv2, the device
gather sampler ``ops.warp.warp_image_rotated`` vs both, and the
pipeline-level invariants (θ=0 reduction to the separable path, flip
mirror identity)."""
import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instancesegmentation_tpu.core.augment import Affine
from instancesegmentation_tpu.ops.warp import (
    WarpParams,
    RotWarpParams,
    center_translation,
    clipped_mask_box,
    instance_warp_params,
    rotated_instance_warp_params,
    rotated_mask_box,
    warp_image,
    warp_image_rotated,
    warp_points,
    warp_points_rotated,
)


def _smooth_image(h, w, c=3):
    """Low-frequency image: double vs single interpolation stay close."""
    ys = np.linspace(0, 3 * np.pi, h)[:, None]
    xs = np.linspace(0, 2 * np.pi, w)[None, :]
    base = 127.5 + 90 * np.sin(ys) * np.cos(xs)
    chans = [base * (0.6 + 0.2 * i) for i in range(c)]
    return np.clip(np.stack(chans, axis=-1), 0, 255).astype(np.float32)


def _mask(h, w):
    m = np.zeros((h, w), np.uint8)
    m[30:70, 40:90] = 255
    return m


# ---------------------------------------------------------------------------
# host oracle
# ---------------------------------------------------------------------------

def test_affine_rotate_inverse_identity():
    a = Affine.rotate(25.0, (96, 128))
    b = Affine.rotate(-25.0, (96, 128))
    m = a.then(b)
    np.testing.assert_allclose(
        m.matrix, np.asarray([[1, 0, 0], [0, 1, 0]], float), atol=1e-12
    )


def test_affine_rotate_center_fixed_point():
    h, w = 96, 128
    a = Affine.rotate(33.0, (h, w))
    center = np.asarray([w / 2.0 - 0.5, h / 2.0 - 0.5])
    np.testing.assert_allclose(a.apply_points(center), center, atol=1e-9)


def test_affine_rotate_90_maps_points():
    # 90°: dx -> dy under [[c,-s],[s,c]] (x' = -dy, y' = dx about center)
    h = w = 101
    a = Affine.rotate(90.0, (h, w))
    c = np.asarray([w / 2.0 - 0.5, h / 2.0 - 0.5])
    p = c + np.asarray([10.0, 0.0])
    out = a.apply_points(p)
    np.testing.assert_allclose(out, c + np.asarray([0.0, 10.0]), atol=1e-9)


# ---------------------------------------------------------------------------
# device sampler vs cv2 (pure rotation: window = whole canvas, t = 0)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("deg", [-25.0, 13.0, 90.0])
def test_device_rotation_matches_cv2(deg):
    h, w = 96, 128
    img = _smooth_image(h, w)
    host = Affine.rotate(deg, (h, w)).apply_image(img)

    theta = math.radians(deg)
    hw = jnp.asarray([h, w], jnp.float32)
    p = RotWarpParams(
        scale=jnp.asarray([1.0, 1.0]),
        origin=jnp.asarray([0.0, 0.0]),
        cos_sin=jnp.asarray([math.cos(theta), math.sin(theta)]),
        center=jnp.asarray([h / 2.0 - 0.5, w / 2.0 - 0.5]),
        t=jnp.asarray([0.0, 0.0]),
        src_lo=jnp.asarray([0.0, 0.0]),
        src_hi=hw,
        canvas_hw=hw,
    )
    dev = np.asarray(warp_image_rotated(jnp.asarray(img), p, (h, w)))
    # cv2 uses 5-bit fixed-point bilinear taps; interior agreement ~1 LSB
    assert np.mean(np.abs(dev - host)) < 1.0
    assert np.percentile(np.abs(dev - host), 99) < 6.0


# ---------------------------------------------------------------------------
# keypoint geometry: exact affine composition parity
# ---------------------------------------------------------------------------

def test_rotated_points_match_host_affine_composition():
    h, w, out = 96, 128, 64
    deg = 17.0
    mask = _mask(h, w)
    obj_box = jnp.asarray([38.0, 28.0, 92.0, 72.0])
    hw = jnp.asarray([h, w], jnp.float32)
    theta = jnp.asarray(math.radians(deg))

    t = center_translation(obj_box, hw)
    rbox, rvalid = rotated_mask_box(jnp.asarray(mask), t, theta, hw)
    params = rotated_instance_warp_params(
        obj_box, rbox, hw, theta, (out, out), 16, rvalid
    )

    pts = jnp.asarray([[45.0, 35.0], [80.0, 60.0], [10.0, 90.0]])
    dev = np.asarray(warp_points_rotated(pts, params))

    ty, tx = float(t[0]), float(t[1])
    x0, y0, x1, y1 = [float(v) for v in np.asarray(rbox)]
    window = (x0 - 16, y0 - 16, x1 + 16, y1 + 16)
    host_aff = (
        Affine.translate(tx, ty, (h, w))
        .then(Affine.rotate(deg, (h, w)))
        .then(Affine.crop_resize(window, (out, out)))
    )
    host = host_aff.apply_points(np.asarray(pts))
    np.testing.assert_allclose(dev, host, atol=1e-3)


# ---------------------------------------------------------------------------
# θ=0 reduces exactly to the separable fast path
# ---------------------------------------------------------------------------

def test_zero_angle_matches_separable_path():
    h, w, out = 96, 128, 64
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
    mask = _mask(h, w)
    obj_box = jnp.asarray([38.0, 28.0, 92.0, 72.0])
    hw = jnp.asarray([h, w], jnp.float32)
    t = center_translation(obj_box, hw)

    mbox, mvalid = clipped_mask_box(jnp.asarray(mask), t, hw)
    sep = instance_warp_params(obj_box, mbox, hw, (out, out), 16, mvalid)
    ref = np.asarray(warp_image(jnp.asarray(img), sep, (out, out)))

    theta = jnp.asarray(0.0)
    rbox, rvalid = rotated_mask_box(jnp.asarray(mask), t, theta, hw)
    rot = rotated_instance_warp_params(
        obj_box, rbox, hw, theta, (out, out), 16, rvalid
    )
    got = np.asarray(warp_image_rotated(jnp.asarray(img), rot, (out, out)))
    np.testing.assert_allclose(got, ref, atol=1e-3)

    # keypoints too
    pts = jnp.asarray([[45.0, 35.0], [80.0, 60.0]])
    np.testing.assert_allclose(
        np.asarray(warp_points_rotated(pts, rot)),
        np.asarray(warp_points(pts, sep)),
        atol=1e-4,
    )


# ---------------------------------------------------------------------------
# end-to-end sampling parity with the two-pass host chain (geometry
# pinned to the device window so only interpolation differs)
# ---------------------------------------------------------------------------

def test_rotated_chain_matches_two_pass_host():
    import cv2

    h, w, out = 96, 128, 64
    deg = -19.0
    img = _smooth_image(h, w)
    mask = _mask(h, w)
    obj_box = jnp.asarray([38.0, 28.0, 92.0, 72.0])
    hw = jnp.asarray([h, w], jnp.float32)
    t = center_translation(obj_box, hw)
    theta = jnp.asarray(math.radians(deg))
    rbox, rvalid = rotated_mask_box(jnp.asarray(mask), t, theta, hw)
    params = rotated_instance_warp_params(
        obj_box, rbox, hw, theta, (out, out), 16, rvalid
    )
    dev = np.asarray(
        warp_image_rotated(jnp.asarray(img), params, (out, out))
    )

    # host: integer translate -> cv2 rotate -> crop at the DEVICE window
    # -> cv2 resize (two interpolation passes vs the device's one)
    ty, tx = int(t[0]), int(t[1])
    timg = np.zeros_like(img)
    sy0, sy1 = max(0, -ty), min(h, h - ty)
    sx0, sx1 = max(0, -tx), min(w, w - tx)
    timg[sy0 + ty : sy1 + ty, sx0 + tx : sx1 + tx] = img[sy0:sy1, sx0:sx1]
    rimg = Affine.rotate(deg, (h, w)).apply_image(timg)
    x0, y0, x1, y1 = [int(v) for v in np.asarray(rbox)]
    wx0, wy0, wx1, wy1 = x0 - 16, y0 - 16, x1 + 16, y1 + 16
    crop = np.zeros((wy1 - wy0, wx1 - wx0, 3), np.float32)
    cy0, cy1 = max(0, wy0), min(h, wy1)
    cx0, cx1 = max(0, wx0), min(w, wx1)
    crop[cy0 - wy0 : cy1 - wy0, cx0 - wx0 : cx1 - wx0] = rimg[cy0:cy1, cx0:cx1]
    host = cv2.resize(crop, (out, out), interpolation=cv2.INTER_LINEAR)

    assert np.mean(np.abs(dev - host)) < 2.5
    # mask agreement through both paths
    dmask = np.asarray(
        warp_image_rotated(
            jnp.asarray(mask[..., None].astype(np.float32)), params, (out, out)
        )
    )[..., 0]
    tmask = np.zeros_like(mask, np.float32)
    tmask[sy0 + ty : sy1 + ty, sx0 + tx : sx1 + tx] = mask[sy0:sy1, sx0:sx1]
    rm = Affine.rotate(deg, (h, w)).apply_image(tmask)
    cropm = np.zeros((wy1 - wy0, wx1 - wx0), np.float32)
    cropm[cy0 - wy0 : cy1 - wy0, cx0 - wx0 : cx1 - wx0] = rm[cy0:cy1, cx0:cx1]
    hm = cv2.resize(cropm, (out, out), interpolation=cv2.INTER_LINEAR)
    a = dmask > 127.5
    b = hm > 127.5
    iou = (a & b).sum() / max(1, (a | b).sum())
    assert iou > 0.97


# ---------------------------------------------------------------------------
# pipeline-level invariants
# ---------------------------------------------------------------------------

def _tiny_batch(b=2, canvas=96):
    from instancesegmentation_tpu.data.synthetic import synthetic_host_batch

    return {
        k: jnp.asarray(v) for k, v in synthetic_host_batch(b, canvas).items()
    }


def test_pipeline_rotate_prob_zero_matches_separable():
    from instancesegmentation_tpu.data.pipeline import (
        AugmentConfig,
        preprocess_batch,
    )

    batch = _tiny_batch()
    rng = jax.random.PRNGKey(0)
    base = AugmentConfig(out_size=(64, 64))
    rot0 = AugmentConfig(out_size=(64, 64), rotate=25.0, rotate_prob=0.0)
    im_a, hm_a, mk_a = preprocess_batch(batch, rng, base)
    im_b, hm_b, mk_b = preprocess_batch(batch, rng, rot0)
    np.testing.assert_allclose(np.asarray(im_a), np.asarray(im_b), atol=2e-3)
    np.testing.assert_allclose(np.asarray(hm_a), np.asarray(hm_b), atol=2e-3)
    np.testing.assert_allclose(np.asarray(mk_a), np.asarray(mk_b), atol=2e-3)


def test_pipeline_rotation_runs_and_flip_mirrors():
    from instancesegmentation_tpu.data.pipeline import (
        AugmentConfig,
        preprocess_batch,
    )

    batch = _tiny_batch()
    rng = jax.random.PRNGKey(7)
    cfg = AugmentConfig(out_size=(64, 64), rotate=25.0, rotate_prob=1.0)
    images, heatmaps, masks = jax.jit(
        lambda bt, r: preprocess_batch(bt, r, cfg)
    )(batch, rng)
    assert images.shape == (2, 64, 64, 3)
    assert heatmaps.shape == (2, 64, 64, 17)
    assert bool(jnp.all(jnp.isfinite(images)))
    assert float(jnp.max(masks)) <= 1.0

    flip = AugmentConfig(
        out_size=(64, 64), rotate=25.0, rotate_prob=1.0, flip_prob=1.0
    )
    im_f, _, mk_f = preprocess_batch(batch, rng, flip)
    np.testing.assert_allclose(
        np.asarray(im_f), np.asarray(images)[:, :, ::-1, :], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(mk_f), np.asarray(masks)[:, :, ::-1, :], atol=1e-4
    )


@pytest.mark.parametrize("deg", [-25.0, 13.0, 40.0])
def test_2pass_rotation_matches_cv2(deg):
    """The banded-matmul two-pass sampler holds the same cv2 agreement
    bound as the gather sampler (interior ~1 LSB on smooth images).
    Moderate angles only: the two-pass decomposition degenerates near
    ±90° (ops/warp.py docstring; the pipeline falls back to gather)."""
    from instancesegmentation_tpu.ops.warp import warp_image_rotated_2pass

    h, w = 96, 128
    img = _smooth_image(h, w)
    host = Affine.rotate(deg, (h, w)).apply_image(img)

    theta = math.radians(deg)
    hw = jnp.asarray([h, w], jnp.float32)
    p = RotWarpParams(
        scale=jnp.asarray([1.0, 1.0]),
        origin=jnp.asarray([0.0, 0.0]),
        cos_sin=jnp.asarray([math.cos(theta), math.sin(theta)]),
        center=jnp.asarray([h / 2.0 - 0.5, w / 2.0 - 0.5]),
        t=jnp.asarray([0.0, 0.0]),
        src_lo=jnp.asarray([0.0, 0.0]),
        src_hi=hw,
        canvas_hw=hw,
    )
    dev = np.asarray(warp_image_rotated_2pass(jnp.asarray(img), p, (h, w)))
    assert np.mean(np.abs(dev - host)) < 1.0
    assert np.percentile(np.abs(dev - host), 99) < 6.0


def test_2pass_zero_angle_exact_and_small_angle_close():
    """θ=0: the two-pass sampler is numerically the separable bilinear
    (same taps, same weights).  Small angles: interior agreement with
    the one-pass gather stays tight on smooth images (the two differ
    only by the horizontal-lerp-at-integer-rows two-pass semantics)."""
    from instancesegmentation_tpu.ops.warp import warp_image_rotated_2pass

    h, w, out = 96, 128, 64
    img = _smooth_image(h, w)
    mask = _mask(h, w)
    obj_box = jnp.asarray([38.0, 28.0, 92.0, 72.0])
    hw = jnp.asarray([h, w], jnp.float32)
    t = center_translation(obj_box, hw)

    for deg, atol_mean in ((0.0, 1e-3), (17.0, 0.5)):
        theta = jnp.asarray(math.radians(deg))
        rbox, rvalid = rotated_mask_box(jnp.asarray(mask), t, theta, hw)
        params = rotated_instance_warp_params(
            obj_box, rbox, hw, theta, (out, out), 16, rvalid
        )
        a = np.asarray(warp_image_rotated(jnp.asarray(img), params, (out, out)))
        b32 = np.asarray(
            warp_image_rotated_2pass(jnp.asarray(img), params, (out, out))
        )
        b16 = np.asarray(warp_image_rotated_2pass(
            jnp.asarray(img), params, (out, out), hat_dtype=jnp.bfloat16
        ))
        if deg == 0.0:
            # f32 hats (default): numerically the separable bilinear;
            # the bf16 hat_dtype knob quantizes tap weights at ~2^-8 —
            # still finer than cv2's 1/32 fixed-point taps (≤ ~1 LSB
            # on 255-scale); measured throughput-neutral so f32 ships
            np.testing.assert_allclose(a, b32, atol=1e-3)
            assert np.mean(np.abs(a - b16)) < 0.5
            assert np.max(np.abs(a - b16)) < 2.0
        else:
            assert np.mean(np.abs(a - b32)) < atol_mean
            assert np.mean(np.abs(a - b16)) < atol_mean + 0.5


def test_pipeline_rotate_impls_agree():
    """preprocess_batch with rotate_impl='2pass' vs 'gather' produces
    closely matching images/masks on the synthetic batch.  (2level, the
    default, has its own agreement test below with the looser bound its
    blocked residual shift warrants.)"""
    from instancesegmentation_tpu.data.pipeline import (
        AugmentConfig,
        preprocess_batch,
    )

    batch = _tiny_batch(b=4)
    rng = jax.random.PRNGKey(11)
    two = AugmentConfig(out_size=(64, 64), rotate=25.0, rotate_prob=1.0,
                        rotate_impl="2pass")
    gat = dataclasses.replace(two, rotate_impl="gather")
    im_a, hm_a, mk_a = preprocess_batch(batch, rng, two)
    im_b, hm_b, mk_b = preprocess_batch(batch, rng, gat)
    # images live in [-1, 1]; masks in [0, 1].  Two-pass vs one-pass
    # sampling differs pointwise near edges; means must be tight.
    assert float(jnp.mean(jnp.abs(im_a - im_b))) < 0.02
    assert float(jnp.mean(jnp.abs(mk_a - mk_b))) < 0.02
    np.testing.assert_array_equal(np.asarray(hm_a), np.asarray(hm_b))


@pytest.mark.parametrize("chunk", [2, 4])
def test_pipeline_rotate_chunk_matches_full_vmap(chunk):
    """Staged rotated warp (lax.map batch_size=k, ROOFLINE.md §6) is
    bit-identical to the full-batch vmap — per-sample ops only, no
    cross-batch math.  chunk=2 exercises the non-divisible remainder
    (b=5), chunk=4 a single partial tail chunk."""
    from instancesegmentation_tpu.data.pipeline import (
        AugmentConfig,
        preprocess_batch,
    )

    batch = _tiny_batch(b=5)
    rng = jax.random.PRNGKey(3)
    full = AugmentConfig(
        out_size=(64, 64), rotate=25.0, rotate_prob=1.0, flip_prob=0.5
    )
    staged = dataclasses.replace(full, rotate_chunk=chunk)
    ims_a = jax.jit(lambda bt, r: preprocess_batch(bt, r, full))(batch, rng)
    ims_b = jax.jit(lambda bt, r: preprocess_batch(bt, r, staged))(batch, rng)
    for a, b_ in zip(ims_a, ims_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    # chunk >= b falls back to the vmap path (same compiled program)
    big = dataclasses.replace(full, rotate_chunk=8)
    ims_c = jax.jit(lambda bt, r: preprocess_batch(bt, r, big))(batch, rng)
    for a, c in zip(ims_a, ims_c):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


# ---------------------------------------------------------------------------
# two-LEVEL sampler (blocked hats + banded residual shift, ops/warp.py)
# ---------------------------------------------------------------------------

def _rot_params_pure(deg, h, w):
    theta = math.radians(deg)
    hw = jnp.asarray([h, w], jnp.float32)
    return RotWarpParams(
        scale=jnp.asarray([1.0, 1.0]),
        origin=jnp.asarray([0.0, 0.0]),
        cos_sin=jnp.asarray([math.cos(theta), math.sin(theta)]),
        center=jnp.asarray([h / 2.0 - 0.5, w / 2.0 - 0.5]),
        t=jnp.asarray([0.0, 0.0]),
        src_lo=jnp.asarray([0.0, 0.0]),
        src_hi=hw,
        canvas_hw=hw,
    )


def _instance_rot_params(deg, h, w, out, mask, obj_box):
    hw = jnp.asarray([h, w], jnp.float32)
    t = center_translation(obj_box, hw)
    theta = jnp.asarray(math.radians(deg))
    rbox, rvalid = rotated_mask_box(jnp.asarray(mask), t, theta, hw)
    return rotated_instance_warp_params(
        obj_box, rbox, hw, theta, (out, out), 16, rvalid
    )


@pytest.mark.parametrize("deg", [-25.0, 13.0, 40.0])
def test_2level_rotation_matches_cv2_interior(deg):
    """The blocked sampler holds the cv2 bound AWAY from the black cut
    line; on the cut itself its composite kernel (hat⊛hat, ≤1 px extra
    support) softens the hard step edge, so pointwise error there is
    O(intensity step) by construction — bounded via the image mean."""
    import cv2

    from instancesegmentation_tpu.ops.warp import warp_image_rotated_2level

    h, w = 96, 128
    img = _smooth_image(h, w)
    host = Affine.rotate(deg, (h, w)).apply_image(img)
    p = _rot_params_pure(deg, h, w)
    dev = np.asarray(
        warp_image_rotated_2level(
            jnp.asarray(img), p, (h, w), theta_max_deg=abs(deg)
        )
    )
    err = np.abs(dev - host)
    assert np.mean(err) < 2.5
    # interior = ≥3 px from any near-black host pixel (the rotation cut)
    content = (host.max(-1) > 10).astype(np.uint8)
    interior = cv2.erode(content, np.ones((7, 7), np.uint8)) > 0
    assert interior.sum() > 0.5 * interior.size
    assert np.percentile(err.max(-1)[interior], 99) < 6.0


def test_2level_zero_angle_bit_matches_2pass():
    """θ=0: zero residual and block-constant hat positions — the
    blocked form reduces to the 2pass (⇒ separable) path."""
    from instancesegmentation_tpu.ops.warp import (
        warp_image_rotated_2level,
        warp_image_rotated_2pass,
    )

    h, w, out = 96, 128, 64
    img = _smooth_image(h, w)
    mask = _mask(h, w)
    obj_box = jnp.asarray([38.0, 28.0, 92.0, 72.0])
    params = _instance_rot_params(0.0, h, w, out, mask, obj_box)
    a = np.asarray(warp_image_rotated_2pass(jnp.asarray(img), params, (out, out)))
    for block in (8, 13, 16):
        b = np.asarray(
            warp_image_rotated_2level(
                jnp.asarray(img), params, (out, out),
                theta_max_deg=25.0, block=block,
            )
        )
        np.testing.assert_allclose(a, b, atol=1e-3)


@pytest.mark.parametrize("block", [8, 13, 16])
def test_2level_matches_2pass_theta_sweep(block):
    """Full instance params (window scale + translation cut active),
    θ sweep including ±theta_max and non-divisible block sizes
    (block=13: h=96→pad 8, out_w=64→pad 1).  Interior mean error vs
    2pass stays tiny; overall mean bounded (cut-line softening)."""
    from instancesegmentation_tpu.ops.warp import (
        warp_image_rotated_2level,
        warp_image_rotated_2pass,
    )

    h, w, out = 96, 128, 64
    img = _smooth_image(h, w)
    mask = _mask(h, w)
    obj_box = jnp.asarray([38.0, 28.0, 92.0, 72.0])
    for deg in (-25.0, -10.0, 17.0, 25.0):
        params = _instance_rot_params(deg, h, w, out, mask, obj_box)
        a = np.asarray(
            warp_image_rotated_2pass(jnp.asarray(img), params, (out, out))
        )
        b = np.asarray(
            warp_image_rotated_2level(
                jnp.asarray(img), params, (out, out),
                theta_max_deg=25.0, block=block,
            )
        )
        assert np.all(np.isfinite(b))
        assert np.mean(np.abs(a - b)) < 1.0


def test_2level_flipped_params_match_2pass():
    """Negative scale_x (flip) stays within the residual band (|a_x| ≤
    scale_x_max bounds the pass-2 residual magnitude symmetrically)."""
    from instancesegmentation_tpu.ops.warp import (
        flip_rot_params_x,
        warp_image_rotated_2level,
        warp_image_rotated_2pass,
    )

    h, w, out = 96, 128, 64
    img = _smooth_image(h, w)
    mask = _mask(h, w)
    obj_box = jnp.asarray([38.0, 28.0, 92.0, 72.0])
    params = flip_rot_params_x(
        _instance_rot_params(17.0, h, w, out, mask, obj_box), out
    )
    a = np.asarray(warp_image_rotated_2pass(jnp.asarray(img), params, (out, out)))
    b = np.asarray(
        warp_image_rotated_2level(
            jnp.asarray(img), params, (out, out), theta_max_deg=25.0
        )
    )
    assert np.mean(np.abs(a - b)) < 1.0


def test_2level_band_edge_clips_gracefully():
    """|θ| past theta_max_deg violates the contract: the residual delta
    is CLIPPED to the band edge, so the output degrades to a
    nearest-band sample — finite and still close in the mean, never
    zeroed taps / black stripes (ADVICE r4)."""
    from instancesegmentation_tpu.ops.warp import (
        warp_image_rotated_2level,
        warp_image_rotated_2pass,
    )

    h, w, out = 96, 128, 64
    img = _smooth_image(h, w)
    mask = _mask(h, w)
    obj_box = jnp.asarray([38.0, 28.0, 92.0, 72.0])
    params = _instance_rot_params(30.0, h, w, out, mask, obj_box)
    a = np.asarray(warp_image_rotated_2pass(jnp.asarray(img), params, (out, out)))
    b = np.asarray(
        warp_image_rotated_2level(
            jnp.asarray(img), params, (out, out), theta_max_deg=25.0
        )
    )
    assert np.all(np.isfinite(b))
    assert np.mean(np.abs(a - b)) < 2.5
    # exactly AT the bound the residual spans the full band and is kept
    params25 = _instance_rot_params(25.0, h, w, out, mask, obj_box)
    a25 = np.asarray(
        warp_image_rotated_2pass(jnp.asarray(img), params25, (out, out))
    )
    b25 = np.asarray(
        warp_image_rotated_2level(
            jnp.asarray(img), params25, (out, out), theta_max_deg=25.0
        )
    )
    assert np.mean(np.abs(a25 - b25)) < 1.0


def test_2level_theta_max_unit_guard():
    """theta_max_deg is DEGREES: 0, negative-zero-span and ≥60 values
    are rejected at trace time (a radians-valued 25° ≈ 0.436 cannot be
    detected, but the ≥60 guard catches the common scale errors)."""
    from instancesegmentation_tpu.ops.warp import warp_image_rotated_2level

    h, w, out = 96, 128, 64
    img = _smooth_image(h, w)
    mask = _mask(h, w)
    obj_box = jnp.asarray([38.0, 28.0, 92.0, 72.0])
    params = _instance_rot_params(17.0, h, w, out, mask, obj_box)
    for bad in (0.0, 60.0, 90.0):
        with pytest.raises(ValueError, match="DEGREES"):
            warp_image_rotated_2level(
                jnp.asarray(img), params, (out, out), theta_max_deg=bad
            )


def test_pipeline_rotate_impl_2level_agrees():
    """preprocess_batch with rotate_impl='2level' matches '2pass' on a
    blob-mask batch, and the staged lax.map path is bit-identical to
    the full vmap.  The image bound is looser than the 2pass-vs-gather
    one (0.1 vs 0.02 in [-1,1] units): the blocked sampler's composite
    kernel (hat⊛lerp per axis, support 2 px) smooths the synthetic
    batch's noise texture more than plain bilinear.  GEOMETRY must
    agree: binarized-mask IoU on solid blobs (the real mask operating
    point — perimeter-only softening) must stay high.  The default
    salt-noise synthetic masks are the adversarial case (every feature
    is 1 px wide) and erode to ~0.63 IoU — that regime does not occur
    for human instance masks and is documented in ops/warp.py."""
    from instancesegmentation_tpu.data.pipeline import (
        AugmentConfig,
        preprocess_batch,
    )

    batch = dict(_tiny_batch(b=4))
    # solid-ellipse masks at each sample's mask_box (realistic blobs)
    masks = np.zeros((4, 96, 96), np.uint8)
    import cv2

    for i in range(4):
        x0, y0, x1, y1 = [int(v) for v in np.asarray(batch["mask_box"][i])]
        cv2.ellipse(
            masks[i], ((x0 + x1) // 2, (y0 + y1) // 2),
            ((x1 - x0) // 2, (y1 - y0) // 2), 0, 0, 360, 255, -1,
        )
    batch["mask"] = jnp.asarray(masks)
    rng = jax.random.PRNGKey(11)
    two = AugmentConfig(out_size=(64, 64), rotate=25.0, rotate_prob=1.0,
                        rotate_impl="2pass")
    lvl = dataclasses.replace(two, rotate_impl="2level")
    im_a, hm_a, mk_a = preprocess_batch(batch, rng, two)
    im_b, hm_b, mk_b = preprocess_batch(batch, rng, lvl)
    assert float(jnp.mean(jnp.abs(im_a - im_b))) < 0.1
    assert float(jnp.mean(jnp.abs(mk_a - mk_b))) < 0.02
    a = np.asarray(mk_a) > 0.5
    b = np.asarray(mk_b) > 0.5
    iou = (a & b).sum() / max(1, (a | b).sum())
    assert iou > 0.95
    np.testing.assert_array_equal(np.asarray(hm_a), np.asarray(hm_b))

    staged = dataclasses.replace(lvl, rotate_chunk=2)
    im_c, hm_c, mk_c = jax.jit(
        lambda bt, r: preprocess_batch(bt, r, staged)
    )(batch, rng)
    im_j, hm_j, mk_j = jax.jit(
        lambda bt, r: preprocess_batch(bt, r, lvl)
    )(batch, rng)
    np.testing.assert_array_equal(np.asarray(im_c), np.asarray(im_j))
    np.testing.assert_array_equal(np.asarray(mk_c), np.asarray(mk_j))


def test_default_rotate_impl_is_2level():
    """The default rotated sampler is a MEASURED decision (ROOFLINE.md
    §Round-5: 2level is fastest at both operating points, quality at
    parity over 5 seeds, and survives long single-dispatch loops) —
    pin it in pipeline AND train config so a drive-by edit can't
    silently regress rotated training to a slower sampler."""
    from instancesegmentation_tpu.data.pipeline import AugmentConfig
    from instancesegmentation_tpu.train.config import TrainConfig

    assert AugmentConfig(out_size=(64, 64)).rotate_impl == "2level"
    assert TrainConfig().rotate_impl == "2level"
