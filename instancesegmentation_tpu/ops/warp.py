"""Fused instance-crop warp: the reference's 2-stage imgaug chain as ONE
device-side scale-and-translate.

The reference preprocesses each sample on CPU workers with two imgaug
passes (reference train_instance.py:139-196, SURVEY.md §2.9):

  1. ``iaa.Affine(translate_px=(tx, ty))`` with
     ``tx = int(iw/2 - box_cx)``, ``ty = int(ih/2 - box_cy)`` — center
     the annotated object box (black fill),
  2. recompute the instance-mask bbox on the translated mask, then
     ``iaa.CropAndPad`` to that bbox + 16 px per side (black pad) and
     ``iaa.Resize`` to the output size.

Because the translation is integral and fills black, and the crop pads
black, the composition is exactly one affine warp with zero-fill:

  src = (u + 0.5) * win/out - 0.5 + (win_origin - t)

where ``win = clip(mask_box + t, canvas) ± pad`` (the bbox of the
translated-then-clipped mask is exactly the clipped translated bbox).
We execute it with ``jax.image.scale_and_translate`` (separable kernel
=> two 1-D contractions, MXU-friendly) inside the jitted step — no host
image work beyond decode + pad-to-canvas.

Train-time augmentations the reference kept commented out (flip, scale
jitter — BASELINE.json names them as build requirements) are enabled
options folded into the same warp parameters.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


#: Margin (px) jittered windows may extend beyond the canvas.  The
#: sampler itself is exactly zero-fill at any distance (see
#: ``_axis_weights``); this constant only bounds the jitter so crops
#: stay near the canvas.
SRC_PAD = 24


class WarpParams(NamedTuple):
    """Per-sample output->source mapping ``src = (u+0.5)*scale - 0.5 + offset``.

    scale, offset: [..., 2] arrays ordered (y, x).
    src_lo, src_hi: optional [..., 2] valid source interval per axis —
    source pixels outside ``[lo, hi)`` contribute zero.  This encodes
    the TRANSLATED-canvas boundary: the reference's centering translate
    cuts content shifted off-canvas and fills black, so positions whose
    translated coordinate leaves the canvas must read black even though
    the source pixel exists (content-leak bug otherwise).
    """

    scale: jax.Array
    offset: jax.Array
    src_lo: jax.Array | None = None
    src_hi: jax.Array | None = None


def center_translation(obj_box: jax.Array, image_hw: jax.Array):
    """The reference's centering translation (ty, tx) — int() truncates
    toward zero (reference train_instance.py:141-156)."""
    h, w = image_hw[0], image_hw[1]
    tx = jnp.trunc(w / 2.0 - (obj_box[0] + obj_box[2]) / 2.0)
    ty = jnp.trunc(h / 2.0 - (obj_box[1] + obj_box[3]) / 2.0)
    return ty, tx


def clipped_mask_box(mask: jax.Array, ty_tx, image_hw: jax.Array):
    """Tight bbox (source coords, exclusive upper) of the mask pixels
    that SURVIVE the centering translation, plus a validity flag.

    Matches the reference exactly: it recomputes ``mask2box`` on the
    translated mask (train_instance.py:160-161), whose bbox equals the
    bbox of source pixels with on-canvas translated coordinates.  A
    plain ``clip(bbox + t)`` is wider for non-rectangular masks
    partially pushed off-canvas.
    """
    ty, tx = ty_tx
    h, w = image_hw[0], image_hw[1]
    ch, cw = mask.shape[0], mask.shape[1]
    ys = jax.lax.broadcasted_iota(jnp.float32, (ch, cw), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (ch, cw), 1)
    on = (
        (mask > 0)
        & (xs + tx >= 0) & (xs + tx < w)
        & (ys + ty >= 0) & (ys + ty < h)
    )
    valid = jnp.any(on)
    big = jnp.float32(max(ch, cw))
    x0 = jnp.min(jnp.where(on, xs, big))
    y0 = jnp.min(jnp.where(on, ys, big))
    x1 = jnp.max(jnp.where(on, xs, -1.0)) + 1.0
    y1 = jnp.max(jnp.where(on, ys, -1.0)) + 1.0
    return jnp.stack([x0, y0, x1, y1]), valid


def instance_warp_params(
    obj_box: jax.Array,
    mask_box: jax.Array,
    image_hw: jax.Array,
    out_hw: tuple[int, int],
    pad: int = 16,
    mask_valid: jax.Array | bool = True,
    jitter: jax.Array | None = None,
) -> WarpParams:
    """Compute the fused warp for one sample (all inputs float arrays).

    obj_box:   [4] xyxy annotation box (drives the centering translation,
               reference train_instance.py:141-156).
    mask_box:  [4] xyxy tight instance-mask box in ORIGINAL coords
               (x1/y1 exclusive).
    image_hw:  [2] (h, w) of the original image.
    mask_valid: False => fall back to the whole image as the crop box
               (reference :163-164).
    jitter:    optional [4] multiplicative window jitter (dy0, dx0, dy1,
               dx1) as fractions of window size — the reference's
               commented-out ±0.2·box jitter (ref :172-173,186-187),
               enabled as an option.

    Returns WarpParams mapping output pixels to original-image pixels.
    """
    h, w = image_hw[0], image_hw[1]
    ty, tx = center_translation(obj_box, image_hw)

    # translated & canvas-clipped instance box (== bbox of translated mask)
    mb = jnp.where(
        jnp.asarray(mask_valid),
        mask_box,
        jnp.stack([0.0 - tx, 0.0 - ty, w - tx, h - ty]),
    )
    bx0 = jnp.clip(mb[0] + tx, 0.0, w)
    by0 = jnp.clip(mb[1] + ty, 0.0, h)
    bx1 = jnp.clip(mb[2] + tx, 0.0, w)
    by1 = jnp.clip(mb[3] + ty, 0.0, h)

    # crop window = box +/- pad (reference :166-171)
    wx0, wy0 = bx0 - pad, by0 - pad
    wx1, wy1 = bx1 + pad, by1 + pad

    if jitter is not None:
        win_w = wx1 - wx0
        win_h = wy1 - wy0
        margin = SRC_PAD - 4
        wy0 = jnp.clip(wy0 + jitter[0] * win_h, -margin, h + margin)
        wx0 = jnp.clip(wx0 + jitter[1] * win_w, -margin, w + margin)
        wy1 = jnp.clip(wy1 + jitter[2] * win_h, wy0 + 1.0, h + margin)
        wx1 = jnp.clip(wx1 + jitter[3] * win_w, wx0 + 1.0, w + margin)

    out_h, out_w = out_hw
    scale = jnp.stack([(wy1 - wy0) / out_h, (wx1 - wx0) / out_w])
    offset = jnp.stack([wy0 - ty, wx0 - tx])
    # valid source interval: positions whose translated coordinate stays
    # on-canvas (the reference's translate cuts everything else)
    src_lo = jnp.stack([jnp.maximum(0.0, -ty), jnp.maximum(0.0, -tx)])
    src_hi = jnp.stack([jnp.minimum(h, h - ty), jnp.minimum(w, w - tx)])
    return WarpParams(scale=scale, offset=offset, src_lo=src_lo, src_hi=src_hi)


def _axis_weights(scale, offset, in_size: int, out_size: int,
                  lo=None, hi=None) -> jax.Array:
    """Bilinear (hat-kernel) sampling weights [out_size, in_size].

    Row u holds the interpolation weights of source pixels for output
    pixel u at ``src = (u+0.5)*scale - 0.5 + offset``.  Weights of
    out-of-canvas source positions simply don't exist, so boundary
    blends mix with an implicit zero — EXACTLY imgaug's constant black
    fill (no clamp, no renormalization).  Negative scales (flips) fall
    out for free.  ``lo``/``hi`` additionally zero source pixels outside
    the valid interval (the translated-canvas cut).
    """
    u = jax.lax.broadcasted_iota(jnp.float32, (out_size, 1), 0)
    grid = jax.lax.broadcasted_iota(jnp.float32, (1, in_size), 1)
    src = (u + 0.5) * scale - 0.5 + offset
    weights = jnp.maximum(0.0, 1.0 - jnp.abs(src - grid))
    if lo is not None:
        weights = weights * ((grid >= lo) & (grid < hi)).astype(weights.dtype)
    return weights


def warp_image(
    image: jax.Array,
    params: WarpParams,
    out_hw: tuple[int, int],
    method: str = "linear",
) -> jax.Array:
    """Sample one [H, W, C] image through WarpParams to [out_h, out_w, C].

    Implemented as two MXU contractions with explicitly-built separable
    bilinear weight matrices.  Compared to ``jax.image.scale_and_translate``
    this gives exact constant-black out-of-bounds semantics (s&t drops
    samples beyond +/-0.5 px and renormalizes inside the band, which
    previously forced a padded source canvas) with identical steady-state
    cost (~3 ms per batch-8 640->480 warp measured on v5e).
    """
    if method != "linear":
        raise NotImplementedError("only bilinear warps are supported")
    out_h, out_w = out_hw
    h, w = image.shape[0], image.shape[1]
    lo = (None, None) if params.src_lo is None else params.src_lo
    hi = (None, None) if params.src_hi is None else params.src_hi
    wy = _axis_weights(params.scale[0], params.offset[0], h, out_h, lo[0], hi[0])
    wx = _axis_weights(params.scale[1], params.offset[1], w, out_w, lo[1], hi[1])
    tmp = jnp.einsum(
        "yh,hwc->ywc", wy, image, preferred_element_type=jnp.float32
    )
    return jnp.einsum(
        "xw,ywc->yxc", wx, tmp, preferred_element_type=jnp.float32
    )


def warp_points(points_xy: jax.Array, params: WarpParams) -> jax.Array:
    """Map [K, 2] (x, y) source points into output coordinates.

    Uses the imgaug keypoint convention (plain ratio scaling without the
    half-pixel shift): ``x' = (x - offset_x) / scale_x``.  Requires
    POSITIVE scales — the half-pixel terms this convention drops only
    cancel then; flip augmentation must mirror points in output space
    (``x' = (out_w - 1) - x``) rather than mapping through flipped
    params (see data/pipeline.py).
    """
    sx = params.scale[1]
    sy = params.scale[0]
    x = (points_xy[..., 0] - params.offset[1]) / sx
    y = (points_xy[..., 1] - params.offset[0]) / sy
    return jnp.stack([x, y], axis=-1)


def flip_params_x(params: WarpParams, out_w: int) -> WarpParams:
    """Mirror the warp horizontally (sample right-to-left).

    Equivalent to flipping the warped image; used for the enabled
    horizontal-flip augmentation (``iaa.Fliplr`` in the reference's
    commented-out chain, tool/show_aug.py:92).
    """
    # flipped sample u reads src of (out_w-1-u):
    # src = (out_w-1-u+0.5)*s - 0.5 + off = (u+0.5)*(-s) - 0.5 + (off + out_w*s)
    scale = jnp.stack([params.scale[0], -params.scale[1]])
    offset = jnp.stack([params.offset[0], params.offset[1] + out_w * params.scale[1]])
    return WarpParams(
        scale=scale, offset=offset,
        src_lo=params.src_lo, src_hi=params.src_hi,
    )


# ---------------------------------------------------------------------------
# Rotation (the reference's commented-out ±25° aug, train_instance.py:153-155,
# enabled as an option).  The chain becomes translate -> rotate-about-center
# -> mask-box crop+resize; rotation is not separable, so this path samples
# with a 4-tap bilinear gather instead of the two MXU contractions above.
# The separable path remains the statically-selected fast path when the
# rotation option is off (data/pipeline.AugmentConfig.rotate == 0).
# ---------------------------------------------------------------------------


class RotWarpParams(NamedTuple):
    """Per-sample fused translate∘rotate∘crop∘resize mapping.

    Output pixel (u, v) -> rotated-frame position
    ``p_rot = (uv + 0.5) * scale - 0.5 + origin``; positions outside the
    canvas read black (the rotation pass cuts to the canvas).  Source
    position ``src = center + R(-theta) @ (p_rot - center) - t``; source
    pixels outside ``[src_lo, src_hi)`` read black (the translation
    cut, same semantics as WarpParams.src_lo/hi).

    All fields [..., 2] ordered (y, x) except ``cos_sin`` = (cos, sin).
    """

    scale: jax.Array
    origin: jax.Array
    cos_sin: jax.Array
    center: jax.Array
    t: jax.Array        # (ty, tx) centering translation
    src_lo: jax.Array
    src_hi: jax.Array
    canvas_hw: jax.Array


def rotated_mask_box(mask: jax.Array, ty_tx, theta: jax.Array,
                     image_hw: jax.Array):
    """bbox (rotated-frame coords, x1/y1 exclusive) of the mask pixels
    surviving translate -> rotate-about-center, plus a validity flag.

    Defines the crop window exactly as the reference would with its
    rotation line enabled: ``mask2box`` recomputed on the augmented mask
    (train_instance.py:160-161).  The geometric bbox of surviving pixel
    centers stands in for the rasterized bbox (bilinear rasterization
    can bleed ≤1 px wider; rotation was never enabled in the reference,
    so there is no bit-parity target — documented design equivalence).
    """
    ty, tx = ty_tx
    h, w = image_hw[0], image_hw[1]
    ch, cw = mask.shape[0], mask.shape[1]
    ys = jax.lax.broadcasted_iota(jnp.float32, (ch, cw), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (ch, cw), 1)
    xt = xs + tx
    yt = ys + ty
    on = (mask > 0) & (xt >= 0) & (xt < w) & (yt >= 0) & (yt < h)
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    cx = w / 2.0 - 0.5
    cy = h / 2.0 - 0.5
    xr = cx + c * (xt - cx) - s * (yt - cy)
    yr = cy + s * (xt - cx) + c * (yt - cy)
    on = on & (xr >= 0) & (xr < w) & (yr >= 0) & (yr < h)
    valid = jnp.any(on)
    big = jnp.float32(max(ch, cw)) * 2.0
    x0 = jnp.floor(jnp.min(jnp.where(on, xr, big)))
    y0 = jnp.floor(jnp.min(jnp.where(on, yr, big)))
    x1 = jnp.floor(jnp.max(jnp.where(on, xr, -big))) + 1.0
    y1 = jnp.floor(jnp.max(jnp.where(on, yr, -big))) + 1.0
    return jnp.stack([x0, y0, x1, y1]), valid


def rotated_instance_warp_params(
    obj_box: jax.Array,
    rot_box: jax.Array,
    image_hw: jax.Array,
    theta: jax.Array,
    out_hw: tuple[int, int],
    pad: int = 16,
    box_valid: jax.Array | bool = True,
    jitter: jax.Array | None = None,
) -> RotWarpParams:
    """Fused warp params with rotation: the RotWarpParams analogue of
    ``instance_warp_params``.  ``rot_box`` is the rotated-frame crop box
    from ``rotated_mask_box``; invalid boxes fall back to the whole
    canvas (reference train_instance.py:163-164)."""
    h, w = image_hw[0], image_hw[1]
    ty, tx = center_translation(obj_box, image_hw)

    rb = jnp.where(
        jnp.asarray(box_valid), rot_box, jnp.stack([0.0, 0.0, w, h])
    )
    wx0, wy0 = rb[0] - pad, rb[1] - pad
    wx1, wy1 = rb[2] + pad, rb[3] + pad
    if jitter is not None:
        win_w = wx1 - wx0
        win_h = wy1 - wy0
        margin = SRC_PAD - 4
        wy0 = jnp.clip(wy0 + jitter[0] * win_h, -margin, h + margin)
        wx0 = jnp.clip(wx0 + jitter[1] * win_w, -margin, w + margin)
        wy1 = jnp.clip(wy1 + jitter[2] * win_h, wy0 + 1.0, h + margin)
        wx1 = jnp.clip(wx1 + jitter[3] * win_w, wx0 + 1.0, w + margin)

    out_h, out_w = out_hw
    return RotWarpParams(
        scale=jnp.stack([(wy1 - wy0) / out_h, (wx1 - wx0) / out_w]),
        origin=jnp.stack([wy0, wx0]),
        cos_sin=jnp.stack([jnp.cos(theta), jnp.sin(theta)]),
        center=jnp.stack([h / 2.0 - 0.5, w / 2.0 - 0.5]),
        t=jnp.stack([ty, tx]),
        src_lo=jnp.stack([jnp.maximum(0.0, -ty), jnp.maximum(0.0, -tx)]),
        src_hi=jnp.stack([jnp.minimum(h, h - ty), jnp.minimum(w, w - tx)]),
        canvas_hw=jnp.stack([h, w]),
    )


def warp_image_rotated(
    image: jax.Array, params: RotWarpParams, out_hw: tuple[int, int]
) -> jax.Array:
    """Sample one [H, W, C] image through RotWarpParams to
    [out_h, out_w, C] — 4-tap bilinear gather, constant-black fill at
    the canvas boundary, the rotation cut, and the translation cut."""
    out_h, out_w = out_hw
    h, w = image.shape[0], image.shape[1]
    u = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 0)
    v = jax.lax.broadcasted_iota(jnp.float32, (out_h, out_w), 1)
    py = (u + 0.5) * params.scale[0] - 0.5 + params.origin[0]
    px = (v + 0.5) * params.scale[1] - 0.5 + params.origin[1]
    # rotation pass cuts to the canvas: positions outside read black
    rot_ok = (
        (py >= 0) & (py < params.canvas_hw[0])
        & (px >= 0) & (px < params.canvas_hw[1])
    )
    c, s = params.cos_sin[0], params.cos_sin[1]
    cy, cx = params.center[0], params.center[1]
    dy = py - cy
    dx = px - cx
    # inverse rotation R(-theta) back into the translated frame
    sy = cy + (-s) * dx + c * dy - params.t[0]
    sx = cx + c * dx + s * dy - params.t[1]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    flat = image.reshape(h * w, -1).astype(jnp.float32)

    def tap(yi, xi, wgt):
        ok = (
            rot_ok
            & (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            & (yi >= params.src_lo[0]) & (yi < params.src_hi[0])
            & (xi >= params.src_lo[1]) & (xi < params.src_hi[1])
        )
        idx = (
            jnp.clip(yi, 0, h - 1).astype(jnp.int32) * w
            + jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        )
        vals = flat[idx.reshape(-1)].reshape(out_h, out_w, -1)
        return vals * (wgt * ok.astype(jnp.float32))[..., None]

    out = (
        tap(y0, x0, (1 - fy) * (1 - fx))
        + tap(y0, x0 + 1, (1 - fy) * fx)
        + tap(y0 + 1, x0, fy * (1 - fx))
        + tap(y0 + 1, x0 + 1, fy * fx)
    )
    return out


def warp_image_rotated_2pass(
    image: jax.Array, params: RotWarpParams, out_hw: tuple[int, int],
    hat_dtype=jnp.float32,
) -> jax.Array:
    """Two-pass (Catmull–Smith) form of ``warp_image_rotated``: the
    affine sample decomposed into a horizontal then a vertical 1-D lerp
    resample, each expressed as a banded one-hot contraction the MXU
    executes.  Measured on chip (ROT_GATHER_VARIANTS.json, ROOFLINE.md
    §7): 2.19 ms/img vs 13.0 ms for the per-pixel 4-tap gather at the
    640→480 training shape — the TPU runs the dense banded matmul 6×
    faster than the latency-bound gather even though the one-hot is
    materialized.

    Same inverse affine map as ``warp_image_rotated``; per-tap
    boundary/window zeroing matches tap-for-tap on each axis, and the
    rotation cut is applied as exact separable row/column masks.  The
    only sampling difference from the one-pass form is standard
    two-pass semantics: the horizontal lerp is evaluated at the integer
    source rows instead of the fractional ``sy`` (with f32 hats, θ=0
    reduces EXACTLY to the one-pass separable bilinear —
    tests/test_rotation.py).

    VALID FOR |θ| well below 90° only (the pass-1 offsets divide by
    ``m00 = cosθ·scale_y``; the classic two-pass bottleneck degenerates
    as cosθ→0).  The augmentation contract is ±25°; the pipeline
    statically falls back to the gather sampler for ``rotate >= 60``.
    Per-sample transient: one [h, w, out_w] + one [out_w, h, out_h]
    hat tensor — batch callers must stage
    (``AugmentConfig.rotate_chunk``; pipeline auto-chunks this impl).
    ``hat_dtype`` is the hat/operand dtype (accumulation always f32 via
    ``preferred_element_type``).  bf16 hats were measured
    throughput-NEUTRAL on chip (472.9 vs 474.5 µs/img at batch 128,
    ROT_TIME_PROBE.json — the materialized-hat bytes are not the
    binding term), so the default stays f32; the knob remains for
    memory-tight configs (bf16 tap weights quantize at ~2^-8, still
    finer than the cv2 oracle's 1/32 fixed-point taps).
    """
    out_h, out_w = out_hw
    h, w = image.shape[0], image.shape[1]
    f32 = jnp.float32
    cth, sth = params.cos_sin[0], params.cos_sin[1]
    a_y, a_x = params.scale[0], params.scale[1]
    b_y = 0.5 * a_y - 0.5 + params.origin[0]
    b_x = 0.5 * a_x - 0.5 + params.origin[1]
    cy, cx = params.center[0], params.center[1]
    # src = center + R(-theta) @ (p_rot - center) - t, p_rot affine in
    # (u, v)  =>  [sy; sx] = M [u; v] + k
    m00, m01 = cth * a_y, -sth * a_x
    m10, m11 = sth * a_y, cth * a_x
    ky0 = cy + cth * (b_y - cy) - sth * (b_x - cx) - params.t[0]
    kx0 = cx + sth * (b_y - cy) + cth * (b_x - cx) - params.t[1]

    def hat(pos, n_in, lo, hi):
        """[..., n_in] bilinear hat row at fractional position ``pos``
        with per-tap validity [max(0,lo), min(n,hi)) — identical to the
        gather's per-tap ok mask on this axis."""
        taps = jax.lax.broadcasted_iota(jnp.int32, (n_in,), 0).astype(f32)
        wgt = jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - taps))
        ok = (taps >= jnp.maximum(0.0, lo)) & (taps < jnp.minimum(
            jnp.float32(n_in), hi))
        return wgt * ok.astype(f32)

    # pass 1 (horizontal, evaluated at integer canvas rows y):
    # X(y, v) = (m10/m00) y + (m11 - m10 m01 / m00) v + (kx0 - m10 ky0 / m00)
    yi = jax.lax.broadcasted_iota(f32, (h, out_w), 0)
    vi = jax.lax.broadcasted_iota(f32, (h, out_w), 1)
    xpos = (m11 - m10 * m01 / m00) * vi + (m10 / m00) * yi + (
        kx0 - m10 * ky0 / m00
    )
    k1 = hat(xpos, w, params.src_lo[1], params.src_hi[1]).astype(
        hat_dtype
    )                                                        # [h, v, w]
    tmp = jnp.einsum(
        "ywc,yvw->yvc", image.astype(hat_dtype), k1,
        preferred_element_type=f32,
    )                                                        # [h, v, c]

    # pass 2 (vertical): Y(u, v) = m00 u + m01 v + ky0
    ui = jax.lax.broadcasted_iota(f32, (out_h, out_w), 0)
    vi2 = jax.lax.broadcasted_iota(f32, (out_h, out_w), 1)
    ypos = m00 * ui + m01 * vi2 + ky0
    k2 = hat(
        jnp.transpose(ypos), h, params.src_lo[0], params.src_hi[0]
    ).astype(hat_dtype)                                      # [v, u, y]
    out = jnp.einsum(
        "vyc,vuy->uvc",
        jnp.transpose(tmp, (1, 0, 2)).astype(hat_dtype), k2,
        preferred_element_type=f32,
    )

    # rotation cut (p_rot within the canvas) is exactly separable:
    # py depends only on u, px only on v
    pyu = a_y * jax.lax.broadcasted_iota(f32, (out_h,), 0) + b_y
    pxv = a_x * jax.lax.broadcasted_iota(f32, (out_w,), 0) + b_x
    row_ok = (pyu >= 0) & (pyu < params.canvas_hw[0])
    col_ok = (pxv >= 0) & (pxv < params.canvas_hw[1])
    return out * (row_ok[:, None] & col_ok[None, :]).astype(f32)[..., None]


def warp_image_rotated_2level(
    image: jax.Array, params: RotWarpParams, out_hw: tuple[int, int],
    theta_max_deg: float, scale_x_max: float | None = None,
    block: int = 16, hat_dtype=jnp.float32,
) -> jax.Array:
    """Two-LEVEL form of ``warp_image_rotated_2pass``: same two-pass
    affine decomposition, but each pass's banded one-hot tensor is
    generated once per BLOCK of ``block`` rows (columns for pass 2)
    instead of per row, with the per-row residual offset applied as a
    bounded fractional shift — a short static unroll of shifted slices
    with per-row lerp weights, no gather and no dynamic lane shift.

    Motivation (ROOFLINE.md §7): the 2pass sampler's remaining
    ~475 µs/img is hat *generation* (element count — bf16 hats measured
    neutral, so not bytes).  The hats here are ``block×`` fewer
    elements: at 640→480 / block=16, 21.5M vs 344M generated f32
    elements per sample (16×), and the per-sample transient drops from
    ~786 MB to ~86 MB.  The trick is not free: the residual shifts add
    ``2·(D1+D2)+2`` full-tensor FMA slices per sample, a term that
    grows with ``theta_max_deg`` (25° → D1=4, D2=5 at the default
    shapes; 60° → D1=13) — whether the net wins is a chip measurement
    (ROT_TIME_PROBE.json, stage ``pre128_2level``), not an element
    count.

    The residual trick that keeps the shift band STATIC: within a row
    block, pass-1 positions differ only by ``δ(r) = tanθ·(r − rc)``
    SOURCE columns — per-sample scale cancels in ``m10/m00`` — so the
    band is ``D1 = ceil(tan(theta_max)·(block−1)/2)`` regardless of the
    crop window (the naive per-row shift in *output* units is unbounded
    as windows shrink, the dead end recorded in ROOFLINE §7).  Pass 2's
    residual is ``−sinθ·scale_x·(r − rc)`` source rows, bounded by the
    static ``scale_x_max``.  The default ``(w + 2·SRC_PAD)/out_w``
    bound requires the caller's crop windows to satisfy
    ``pad <= SRC_PAD`` (and jitter clamps to ``SRC_PAD−4``, see
    ``instance_warp_params``); wider windows need an explicit
    ``scale_x_max``.  Out-of-contract residuals (|θ| > theta_max_deg,
    or |scale_x| > scale_x_max) are CLIPPED to the band edge —
    graceful nearest-band degradation instead of silently dropped
    taps (tests/test_rotation.py band-edge test).

    Cost of the trick: the residual is a second linear interpolation
    (composite kernel hat⊛lerp per axis, support 2 px — ≤1 source px
    of extra smoothing, same class as the classic two-pass row-lerp
    itself).  Consequence measured in tests/test_rotation.py: on
    smooth content and solid blob masks the agreement with 2pass is
    interior-tight (mean <1/255, blob-mask IoU >0.95); on 1-px
    salt-noise masks — every feature thinner than the composite
    kernel — binarized IoU erodes to ~0.63.  Human instance masks are
    blobs, so the real mask operating point is the former; the θ≠0
    samples this touches are an augmentation, not an eval path.
    ``θ=0`` has zero residual and block-constant positions, so it
    bit-reduces to the 2pass ⇒ separable path.  ``theta_max_deg`` is
    in DEGREES (the pipeline passes the static ``cfg.rotate``, also
    degrees) and MUST bound the |θ| actually sampled; like 2pass,
    invalid past ~60° (divides by m00) — rejected at trace time.
    """
    out_h, out_w = out_hw
    h, w = image.shape[0], image.shape[1]
    f32 = jnp.float32
    G = block
    if scale_x_max is None:
        scale_x_max = (w + 2 * SRC_PAD) / out_w
    t_max_deg = abs(float(theta_max_deg))
    if not 0.0 < t_max_deg < 60.0:
        raise ValueError(
            "theta_max_deg is in DEGREES and must lie in (0, 60): got "
            f"{theta_max_deg!r} (the two-pass decomposition divides by "
            "cos(theta); use the gather sampler beyond 60 deg)"
        )
    t_max = t_max_deg * math.pi / 180.0
    D1 = max(1, int(math.ceil(math.tan(t_max) * (G - 1) / 2.0)))
    D2 = max(1, int(math.ceil(
        math.sin(t_max) * float(scale_x_max) * (G - 1) / 2.0
    )))

    cth, sth = params.cos_sin[0], params.cos_sin[1]
    a_y, a_x = params.scale[0], params.scale[1]
    b_y = 0.5 * a_y - 0.5 + params.origin[0]
    b_x = 0.5 * a_x - 0.5 + params.origin[1]
    cy, cx = params.center[0], params.center[1]
    m00, m01 = cth * a_y, -sth * a_x
    m10, m11 = sth * a_y, cth * a_x
    ky0 = cy + cth * (b_y - cy) - sth * (b_x - cx) - params.t[0]
    kx0 = cx + sth * (b_y - cy) + cth * (b_x - cx) - params.t[1]
    Ax = m11 - m10 * m01 / m00
    Bx = m10 / m00
    Cx = kx0 - m10 * ky0 / m00

    # translation-cut content masks applied to the SOURCE image once
    # (equivalent to the 2pass per-tap lo/hi hat masks: each tmp row
    # reads one img row, each out column one tmp column — masking
    # content up front commutes with both passes and keeps the
    # residual shifts from leaking cut content)
    col = jax.lax.broadcasted_iota(f32, (1, w, 1), 1)
    row = jax.lax.broadcasted_iota(f32, (h, 1, 1), 0)
    mx = (col >= jnp.maximum(0.0, params.src_lo[1])) & (
        col < jnp.minimum(jnp.float32(w), params.src_hi[1]))
    my = (row >= jnp.maximum(0.0, params.src_lo[0])) & (
        row < jnp.minimum(jnp.float32(h), params.src_hi[0]))
    img = image.astype(f32) * (mx & my).astype(f32)

    def hat_plain(pos, n_in):
        taps = jax.lax.broadcasted_iota(jnp.int32, (n_in,), 0).astype(f32)
        return jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - taps))

    def residual_shift(x, delta, D, axis):
        """lerp-shift rows (axis=1: x[i, j] ≈ x_in[i, j + delta_i]) or
        columns (axis=0: x[i, j] ≈ x_in[i + delta_j, j]) by a bounded
        fractional per-index offset — Σ_d hat(δ−d)·shift_d(x), the
        shifts static slices of a zero-padded buffer (black fill,
        matching the canvas-edge semantics of every sampler here).
        Deltas outside [-D, D] (a contract violation: |θ| or scale_x
        past the static bound) clip to the band edge so the output
        degrades to a nearest-band sample instead of zeroed taps."""
        wgt = jnp.maximum(
            0.0,
            1.0 - jnp.abs(
                jnp.clip(delta, -float(D), float(D))[:, None]
                - jnp.arange(-D, D + 1, dtype=f32)[None, :]
            ),
        )                                          # [len(delta), 2D+1]
        if axis == 1:   # shift along columns, delta per row
            pad = jnp.pad(x, ((0, 0), (D, D), (0, 0)))
            acc = jnp.zeros_like(x)
            for j, d in enumerate(range(-D, D + 1)):
                acc = acc + pad[:, D + d: D + d + x.shape[1], :] * (
                    wgt[:, j][:, None, None]
                )
            return acc
        pad = jnp.pad(x, ((D, D), (0, 0), (0, 0)))  # shift rows, delta per col
        acc = jnp.zeros_like(x)
        for j, d in enumerate(range(-D, D + 1)):
            acc = acc + pad[D + d: D + d + x.shape[0], :, :] * (
                wgt[:, j][None, :, None]
            )
        return acc

    # ---- pass 1 (horizontal): X(y, v) = Ax·v + Bx·y + Cx -----------------
    hp = -h % G
    if hp:
        img = jnp.pad(img, ((0, hp), (0, 0), (0, 0)))
    hP = h + hp
    nG1 = hP // G
    rc = (G - 1) / 2.0
    r1 = jnp.tile(jnp.arange(G, dtype=f32) - rc, nG1)          # [hP]
    imgA = residual_shift(img, Bx * r1, D1, axis=1)
    ycent = jnp.arange(nG1, dtype=f32) * G + rc                # [nG1]
    vpos = (
        Ax * jax.lax.broadcasted_iota(f32, (nG1, out_w), 1)
        + Bx * ycent[:, None] + Cx
    )
    k1 = hat_plain(vpos, w).astype(hat_dtype)                  # [nG1, v, w]
    tmp = jnp.einsum(
        "grwc,gvw->grvc",
        imgA.reshape(nG1, G, w, -1).astype(hat_dtype), k1,
        preferred_element_type=f32,
    ).reshape(hP, out_w, -1)[:h]                               # [h, v, c]

    # ---- pass 2 (vertical): Y(u, v) = m00·u + m01·v + ky0 ----------------
    vp = -out_w % G
    if vp:
        tmp = jnp.pad(tmp, ((0, 0), (0, vp), (0, 0)))
    vP = out_w + vp
    nG2 = vP // G
    r2 = jnp.tile(jnp.arange(G, dtype=f32) - rc, nG2)          # [vP]
    tmpA = residual_shift(tmp, m01 * r2, D2, axis=0)
    vcent = jnp.arange(nG2, dtype=f32) * G + rc                # [nG2]
    upos = (
        m00 * jax.lax.broadcasted_iota(f32, (nG2, out_h), 1)
        + m01 * vcent[:, None] + ky0
    )
    k2 = hat_plain(upos, h).astype(hat_dtype)                  # [nG2, u, y]
    out = jnp.einsum(
        "ygrc,guy->ugrc",
        tmpA.reshape(h, nG2, G, -1).astype(hat_dtype), k2,
        preferred_element_type=f32,
    ).reshape(out_h, vP, -1)[:, :out_w]

    pyu = a_y * jax.lax.broadcasted_iota(f32, (out_h,), 0) + b_y
    pxv = a_x * jax.lax.broadcasted_iota(f32, (out_w,), 0) + b_x
    row_ok = (pyu >= 0) & (pyu < params.canvas_hw[0])
    col_ok = (pxv >= 0) & (pxv < params.canvas_hw[1])
    return out * (row_ok[:, None] & col_ok[None, :]).astype(f32)[..., None]


def warp_points_rotated(points_xy: jax.Array, params: RotWarpParams) -> jax.Array:
    """Map [K, 2] (x, y) source points through translate -> rotate ->
    window into output coordinates (imgaug ratio convention, as
    ``warp_points``)."""
    c, s = params.cos_sin[0], params.cos_sin[1]
    cy, cx = params.center[0], params.center[1]
    xt = points_xy[..., 0] + params.t[1]
    yt = points_xy[..., 1] + params.t[0]
    xr = cx + c * (xt - cx) - s * (yt - cy)
    yr = cy + s * (xt - cx) + c * (yt - cy)
    x = (xr - params.origin[1]) / params.scale[1]
    y = (yr - params.origin[0]) / params.scale[0]
    return jnp.stack([x, y], axis=-1)


def flip_rot_params_x(params: RotWarpParams, out_w: int) -> RotWarpParams:
    """Mirror a rotated warp horizontally (same identity as
    ``flip_params_x``: p_rot is affine in the output column)."""
    return params._replace(
        scale=jnp.stack([params.scale[0], -params.scale[1]]),
        origin=jnp.stack(
            [params.origin[0], params.origin[1] + out_w * params.scale[1]]
        ),
    )


def warp_batch(
    images: jax.Array,
    params: WarpParams,
    out_hw: tuple[int, int],
    method: str = "linear",
) -> jax.Array:
    """vmap of ``warp_image`` over a leading batch axis.

    images [B, H, W, C]; params fields [B, 2] -> [B, out_h, out_w, C].
    """
    if params.src_lo is None:
        return jax.vmap(
            lambda im, s, o: warp_image(im, WarpParams(s, o), out_hw, method)
        )(images, params.scale, params.offset)
    return jax.vmap(
        lambda im, s, o, lo, hi: warp_image(
            im, WarpParams(s, o, lo, hi), out_hw, method
        )
    )(images, params.scale, params.offset, params.src_lo, params.src_hi)
