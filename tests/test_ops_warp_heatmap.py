"""Golden tests: fused device warp vs the reference's 2-stage chain,
and exact heatmap-rendering parity (SURVEY.md §7 'hard parts')."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instancesegmentation_tpu.ops.heatmap import render_heatmaps, render_heatmaps_numpy
from instancesegmentation_tpu.ops.warp import (
    WarpParams,
    flip_params_x,
    instance_warp_params,
    warp_batch,
    warp_image,
    warp_points,
)


# ---------------------------------------------------------------------------
# numpy reimplementation of the reference chain (translate -> crop+pad16
# -> resize), used as the golden oracle
# ---------------------------------------------------------------------------

def translate_zero_fill(img: np.ndarray, tx: int, ty: int) -> np.ndarray:
    out = np.zeros_like(img)
    h, w = img.shape[:2]
    sy0, sy1 = max(0, -ty), min(h, h - ty)
    sx0, sx1 = max(0, -tx), min(w, w - tx)
    if sy1 > sy0 and sx1 > sx0:
        out[sy0 + ty : sy1 + ty, sx0 + tx : sx1 + tx] = img[sy0:sy1, sx0:sx1]
    return out


def crop_pad(img: np.ndarray, window) -> np.ndarray:
    """Extract [wy0:wy1, wx0:wx1] with zero padding outside the canvas."""
    wx0, wy0, wx1, wy1 = window
    h, w = img.shape[:2]
    out_shape = (wy1 - wy0, wx1 - wx0) + img.shape[2:]
    out = np.zeros(out_shape, dtype=img.dtype)
    sy0, sy1 = max(0, wy0), min(h, wy1)
    sx0, sx1 = max(0, wx0), min(w, wx1)
    if sy1 > sy0 and sx1 > sx0:
        out[sy0 - wy0 : sy1 - wy0, sx0 - wx0 : sx1 - wx0] = img[sy0:sy1, sx0:sx1]
    return out


def reference_chain(img, obj_box, mask, out_size, pad=16):
    """The reference 2-stage pipeline (train_instance.py:139-196) in numpy."""
    import cv2

    h, w = img.shape[:2]
    x0, y0, x1, y1 = obj_box
    tx = int(w / 2 - (x0 + x1) / 2)
    ty = int(h / 2 - (y0 + y1) / 2)
    img_t = translate_zero_fill(img, tx, ty)
    mask_t = translate_zero_fill(mask, tx, ty)

    from instancesegmentation_tpu.core.boxes import mask2box

    ibox = mask2box(mask_t)
    if ibox is None:
        ibox = [0, 0, w, h]
    bx0, by0, bx1, by1 = ibox
    window = (bx0 - pad, by0 - pad, bx1 + pad, by1 + pad)
    img_c = crop_pad(img_t, window)
    mask_c = crop_pad(mask_t, window)
    img_r = cv2.resize(img_c.astype(np.float32), out_size, interpolation=cv2.INTER_LINEAR)
    mask_r = cv2.resize(mask_c.astype(np.float32), out_size, interpolation=cv2.INTER_LINEAR)
    return img_r, mask_r, (tx, ty, window)


def _synthetic(seed=0, h=96, w=128):
    rng = np.random.default_rng(seed)
    img = rng.uniform(0, 255, size=(h, w, 3)).astype(np.float32)
    mask = np.zeros((h, w), dtype=np.uint8)
    mask[30:70, 40:90] = 255
    obj_box = [38, 28, 92, 72]
    return img, mask, obj_box


def _fused(img, mask, obj_box, out_size):
    from instancesegmentation_tpu.core.boxes import mask2box

    mb = mask2box(mask)
    params = instance_warp_params(
        jnp.asarray(obj_box, jnp.float32),
        jnp.asarray(mb, jnp.float32),
        jnp.asarray(img.shape[:2], jnp.float32),
        out_size,
    )
    img_w = warp_image(jnp.asarray(img), params, out_size)
    mask_w = warp_image(jnp.asarray(mask[..., None], jnp.float32), params, out_size)
    return np.asarray(img_w), np.asarray(mask_w)[..., 0], params


def test_fused_warp_matches_reference_chain():
    img, mask, obj_box = _synthetic()
    out = (64, 64)
    ref_img, ref_mask, _ = reference_chain(img, obj_box, mask, out)
    got_img, got_mask, _ = _fused(img, mask, obj_box, out)

    # interior must match cv2 bilinear exactly (edge ring can differ by
    # a sub-pixel clamp-vs-sample semantic, documented in ops/warp.py)
    np.testing.assert_allclose(got_img[1:-1, 1:-1], ref_img[1:-1, 1:-1], atol=1e-2)
    np.testing.assert_allclose(got_mask[1:-1, 1:-1], ref_mask[1:-1, 1:-1], atol=1e-2)


def test_fused_warp_object_near_edge():
    # object near canvas corner: translation pushes content out, crop
    # window exceeds canvas -> black pad regions must match
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, size=(80, 80, 3)).astype(np.float32)
    mask = np.zeros((80, 80), dtype=np.uint8)
    mask[0:30, 0:24] = 255
    obj_box = [0, 0, 24, 30]
    out = (48, 48)
    ref_img, ref_mask, _ = reference_chain(img, obj_box, mask, out)
    got_img, got_mask, _ = _fused(img, mask, obj_box, out)
    np.testing.assert_allclose(got_img[1:-1, 1:-1], ref_img[1:-1, 1:-1], atol=1e-2)
    np.testing.assert_allclose(got_mask[1:-1, 1:-1], ref_mask[1:-1, 1:-1], atol=1e-2)


def test_empty_mask_falls_back_to_full_image():
    img, _, obj_box = _synthetic()
    h, w = img.shape[:2]
    params = instance_warp_params(
        jnp.asarray(obj_box, jnp.float32),
        jnp.zeros((4,), jnp.float32),
        jnp.asarray([h, w], jnp.float32),
        (64, 64),
        mask_valid=False,
    )
    # window must be the whole translated canvas +/- pad:
    # scale = (dim+32)/64, offset = -pad - t (t folds back to src coords)
    np.testing.assert_allclose(
        np.asarray(params.scale), [(h + 32) / 64, (w + 32) / 64], atol=1e-5
    )
    x0, y0, x1, y1 = obj_box
    tx = np.trunc(w / 2 - (x0 + x1) / 2)
    ty = np.trunc(h / 2 - (y0 + y1) / 2)
    np.testing.assert_allclose(
        np.asarray(params.offset), [-16.0 - ty, -16.0 - tx], atol=1e-5
    )


def test_warp_points_roundtrip():
    img, mask, obj_box = _synthetic()
    from instancesegmentation_tpu.core.boxes import mask2box

    params = instance_warp_params(
        jnp.asarray(obj_box, jnp.float32),
        jnp.asarray(mask2box(mask), jnp.float32),
        jnp.asarray(img.shape[:2], jnp.float32),
        (64, 64),
    )
    pts = jnp.asarray([[40.0, 30.0], [89.0, 69.0]])
    out_pts = np.asarray(warp_points(pts, params))
    # mask box is [40,30,90,70]; window [24,14,106,86] (after translate
    # by t both shift equally, offset folds t back) -> check inverse map
    s = np.asarray(params.scale)
    o = np.asarray(params.offset)
    expect = np.stack(
        [(np.asarray(pts)[:, 0] - o[1]) / s[1], (np.asarray(pts)[:, 1] - o[0]) / s[0]],
        axis=-1,
    )
    np.testing.assert_allclose(out_pts, expect, atol=1e-5)


def test_flip_params():
    img, mask, obj_box = _synthetic()
    out = (64, 64)
    got_img, _, params = _fused(img, mask, obj_box, out)
    flipped = warp_image(jnp.asarray(img), flip_params_x(params, 64), out)
    np.testing.assert_allclose(np.asarray(flipped), got_img[:, ::-1], atol=1e-3)


def test_warp_batch_vmap():
    img, mask, obj_box = _synthetic()
    out = (32, 32)
    _, _, params = _fused(img, mask, obj_box, out)
    batch = jnp.stack([jnp.asarray(img)] * 3)
    bparams = WarpParams(
        scale=jnp.stack([params.scale] * 3), offset=jnp.stack([params.offset] * 3)
    )
    ys = warp_batch(batch, bparams, out)
    single = warp_image(jnp.asarray(img), params, out)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(ys[i]), np.asarray(single), atol=1e-5)


# ---------------------------------------------------------------------------
# heatmaps
# ---------------------------------------------------------------------------

def test_heatmap_exact_match_numpy_golden():
    pts = np.array(
        [
            [32.0, 24.0],     # interior
            [1.5, 2.5],       # near corner
            [63.0, 47.0],     # at the never-rendered last col/row clamp
            [-30.0, 20.0],    # far outside
            [10.0, 100.0],    # below canvas
            [20.3, 17.8],     # fractional
        ],
        dtype=np.float32,
    )
    vis = np.array([True, True, True, True, True, False])
    golden = render_heatmaps_numpy(pts, vis, (48, 64))
    got = np.asarray(render_heatmaps(jnp.asarray(pts), jnp.asarray(vis), (48, 64)))
    np.testing.assert_allclose(got, golden, atol=1e-6)
    assert golden[..., 0].max() > 0.99  # peak at keypoint
    assert golden[..., 5].max() == 0.0  # invisible -> zero map


def test_heatmap_radius_and_threshold():
    # values at distance r hit exactly the threshold boundary; everything
    # rendered must exceed it
    got = np.asarray(
        render_heatmaps(jnp.asarray([[32.0, 24.0]]), jnp.asarray([True]), (48, 64))
    )[..., 0]
    nz = got[got > 0]
    assert nz.min() > 0.01
    r = math.sqrt(-math.log(0.01) * 100)
    ys, xs = np.nonzero(got)
    d = np.sqrt((xs - 32.0) ** 2 + (ys - 24.0) ** 2)
    assert d.max() <= r + 1e-6


def test_heatmap_batch_vmap_shape():
    pts = jnp.zeros((4, 17, 2)) + 10.0
    vis = jnp.ones((4, 17), bool)
    out = jax.vmap(lambda p, v: render_heatmaps(p, v, (32, 32)))(pts, vis)
    assert out.shape == (4, 32, 32, 17)


def test_no_content_leak_past_translated_canvas():
    """Regression: positions whose TRANSLATED coordinate leaves the
    canvas must read black even though the source pixel exists (the
    reference's translate cuts them; review finding, confirmed repro)."""
    w = 8
    img = np.arange(w, dtype=np.float32).reshape(1, w, 1).repeat(8, axis=0)
    # object at far left -> tx = +3; empty mask -> whole-canvas window
    params = instance_warp_params(
        jnp.asarray([0.0, 0.0, 2.0, 8.0]),
        jnp.zeros((4,)),
        jnp.asarray([8.0, 8.0]),
        (8 + 32, 8 + 32),  # 1:1 scale window = canvas +/- 16
        mask_valid=False,
    )
    out = np.asarray(warp_image(jnp.asarray(img), params, (40, 40)))[..., 0]
    # translated coords x_t = src_x + 3; canvas holds x_t in [0,8) ->
    # valid src in [0,5); src pixels 5..7 exist but must be black
    ref = reference_chain(
        img.repeat(3, axis=-1) if img.ndim == 3 else img, [0, 0, 2, 8],
        np.zeros((8, 8), np.uint8), (40, 40),
    )[0][..., 0] if False else None
    # direct check: columns of the output that map to src >= 5 are zero
    s = np.asarray(params.scale)
    o = np.asarray(params.offset)
    for u in range(40):
        src_x = (u + 0.5) * s[1] - 0.5 + o[1]
        if src_x > 4.6:  # fully inside the cut region
            assert np.all(out[:, u] == 0.0), (u, src_x, out[:, u])


def test_fused_matches_chain_nonrect_mask_near_edge():
    """L-shaped mask partially pushed off-canvas: the fused warp must
    reproduce the reference's recomputed (tight) translated-mask bbox,
    not clip(bbox + t) (review finding)."""
    rng = np.random.default_rng(9)
    img = rng.uniform(0, 255, size=(70, 70, 3)).astype(np.float32)
    mask = np.zeros((70, 70), dtype=np.uint8)
    mask[0:50, 0:11] = 255     # vertical bar
    mask[0:12, 0:51] = 255     # top bar
    # annotation box far right -> translation pushes mask left/off
    obj_box = [30, 20, 69, 60]
    out = (48, 48)
    ref_img, ref_mask, _ = reference_chain(img, obj_box, mask, out)

    from instancesegmentation_tpu.ops.warp import center_translation, clipped_mask_box

    t = center_translation(jnp.asarray(obj_box, jnp.float32), jnp.asarray([70.0, 70.0]))
    box, valid = clipped_mask_box(jnp.asarray(mask), t, jnp.asarray([70.0, 70.0]))
    params = instance_warp_params(
        jnp.asarray(obj_box, jnp.float32), box,
        jnp.asarray([70.0, 70.0]), out, mask_valid=valid,
    )
    got_img = np.asarray(warp_image(jnp.asarray(img), params, out))
    got_mask = np.asarray(
        warp_image(jnp.asarray(mask[..., None], jnp.float32), params, out)
    )[..., 0]
    np.testing.assert_allclose(got_img[1:-1, 1:-1], ref_img[1:-1, 1:-1], atol=1e-2)
    np.testing.assert_allclose(got_mask[1:-1, 1:-1], ref_mask[1:-1, 1:-1], atol=1e-2)
