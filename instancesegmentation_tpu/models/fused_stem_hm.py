"""Fold the 17-channel heatmap conditioning through the stem as
per-keypoint patch convs — no full-resolution heatmap tensor.

The conditioned (20-channel) model concatenates RGB with 17 rendered
Gaussian heatmaps (reference train_instance.py:33-68,202) and feeds the
stack to ``init_head_s4`` (reference model/segment.py:19-31).  Measured
on the v5e chip, that dense [H,W,17] stack is pure HBM waste: the
conditioned 480² forward costs 38 µs/img MORE than the 3-channel one
(tools/instance_experiment.py) — the price of writing the ~7.8 MB bf16
stack from the renderer and reading it back into the stem — while every
Gaussian lives entirely inside a ≤45-pixel window around its keypoint
(σ=10, threshold=0.01 ⇒ radius r = σ·√(−ln 0.01) ≈ 21.46, and the
encoder's own window clamp, ops/heatmap.py).

This module exploits that sparsity EXACTLY.  The stem touches the
heatmap channels in two linear/monotone ways, both foldable to
patch-local work:

1. ``conv1`` (k5 s2 p2 over 20 channels) is linear, so
   ``conv1(concat(img, hm)) = conv1_img(img) + Σ_k conv1_k(hm_k)``.
   Each ``hm_k`` is supported on one static 48×48 window, so its
   contribution is a tiny VALID conv of the rendered patch with that
   keypoint's kernel slice, scatter-added into the conv1_img output at
   the (stride-aligned) patch offset.
2. the maxpool4 shortcut: ``maxpool4(hm_k)`` is zero outside the
   pooled patch window (hm ≥ 0), so it is a pooled patch
   dynamic-update-sliced into a zero [H/4, W/4] plane.

BatchNorm running stats are folded into the conv kernels/biases
(inference-only, like models/fused_stem.fold_stem — the affine commutes
with the patch addition because it is applied post-sum via the shared
folded kernel scale).  Patches are rendered with the IDENTICAL
expression as ops/heatmap.render_heatmaps at absolute coordinates, so
the implied dense stack is bit-exact vs the encoder; the only numeric
delta vs the unfused model is conv/BN reduction-order rounding, same
class as models/fused_head (tested f32-tight in
tests/test_fused_stem_hm.py).

Patch geometry (for conv stride 2 and maxpool 4 alignment):
- window width ≤ trunc(x+r+1) − trunc(x−r) ≤ 44 px;
- patch origin x0 = 4·⌊w_min/4⌋ loses ≤ 3 px to alignment ⇒ P = 48
  covers every window, and x0 ≡ 0 (mod 4) keeps maxpool cells intact;
- conv taps reach 4 px past the patch on both sides (k5 s2 p2), so the
  patch is zero-padded by 4 and the VALID s2 conv yields P/2 + 2
  outputs at global output offset x0/2 − 1; a +1-shifted
  [H/2+2, W/2+2] accumulator keeps every update in-bounds (the −1 and
  H/2 rows only occur at image borders where the full conv has no such
  output, and are sliced off).
"""
from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from instancesegmentation_tpu.models.fused_stem import _fold_layer

#: heatmap-encoder constants (ops/heatmap.render_heatmaps defaults;
#: reference train_instance.py:38-41)
SIGMA = 10.0
THRESHOLD = 0.01
#: static patch side: covers the ≤44-px window plus ≤3 px of mod-4
#: alignment loss (see module docstring)
PATCH = 48


class FoldedStemHM(NamedTuple):
    """BN-folded stem kernels with the conv1 kernel split img/heatmap."""

    k1_img: jax.Array   # [5, 5, 3, 16]  conv1 RGB slice, BN-folded, f32
    k1_hm: jax.Array    # [5, 5, 1, 17*16] conv1 heatmap slices as a
                        # feature_group_count=17 grouped kernel
    b1: jax.Array       # [16] folded bias
    a1: jax.Array       # [16] PReLU alpha
    k2: jax.Array       # [5, 5, 16, 16] conv2, BN-folded
    b2: jax.Array       # [16]
    a2: jax.Array       # [16]


def fold_stem_hm(variables: dict, name: str = "init_conv") -> FoldedStemHM:
    """Build from trained conditioned-Segment variables (in_channels=20)."""
    p = variables["params"][name]
    s = variables["batch_stats"][name]
    k1, b1 = _fold_layer(p["layer1"], s["layer1"])
    k2, b2 = _fold_layer(p["layer2"], s["layer2"])
    assert k1.shape[2] == 20, f"conditioned stem expects 20 input ch, got {k1.shape[2]}"
    kh, kw, _, co = k1.shape
    return FoldedStemHM(
        k1_img=k1[:, :, :3, :],
        # grouped-conv layout: kernel[..., 0, g*co + c] applies input
        # group g (= heatmap channel g) to output channel c
        k1_hm=k1[:, :, 3:, :].reshape(kh, kw, 1, 17 * co),
        b1=b1,
        a1=jnp.asarray(p["layer1"]["act"]["alpha"], jnp.float32),
        k2=k2,
        b2=b2,
        a2=jnp.asarray(p["layer2"]["act"]["alpha"], jnp.float32),
    )


def render_heatmap_patches(
    points_xy: jax.Array,
    visible: jax.Array,
    out_hw: tuple[int, int],
    patch: int = PATCH,
    sigma: float = SIGMA,
    threshold: float = THRESHOLD,
):
    """Render each keypoint's exact heatmap window on a static patch.

    Returns ``(patches [P, P, K] f32, x0 [K] i32, y0 [K] i32)`` with
    patch (py, px) holding the heatmap value at absolute pixel
    ``(y0+py, x0+px)`` — bit-exact vs ops/heatmap.render_heatmaps
    (identical windowing/threshold expression at identical absolute
    coordinates; zero where the dense render is zero, including
    everywhere for invisible keypoints).
    """
    h, w = out_hw
    p = min(patch, h, w)
    assert p % 4 == 0, "patch must preserve maxpool4 cells"
    r = math.sqrt(-math.log(threshold) * sigma * sigma)

    pts = points_xy.astype(jnp.float32)
    # guard non-finite coords (padded/invisible keypoints) before trunc
    pts = jnp.where(jnp.isfinite(pts), pts, 0.0)
    x = pts[:, 0].reshape(1, 1, -1)
    y = pts[:, 1].reshape(1, 1, -1)

    x_min = jnp.maximum(0.0, jnp.trunc(x - r))
    x_max = jnp.minimum(float(w - 1), jnp.trunc(x + r + 1.0))
    y_min = jnp.maximum(0.0, jnp.trunc(y - r))
    y_max = jnp.minimum(float(h - 1), jnp.trunc(y + r + 1.0))

    # mod-4-aligned patch origin covering the whole window
    x0 = jnp.clip((x_min.astype(jnp.int32) // 4) * 4, 0, w - p)
    y0 = jnp.clip((y_min.astype(jnp.int32) // 4) * 4, 0, h - p)

    # absolute coordinates of the patch grid (exact small ints in f32)
    xs = x0.astype(jnp.float32) + jax.lax.broadcasted_iota(
        jnp.float32, (1, p, 1), 1
    )
    ys = y0.astype(jnp.float32) + jax.lax.broadcasted_iota(
        jnp.float32, (p, 1, 1), 0
    )

    # identical arithmetic to render_heatmaps (bit-exact values)
    inv = 1.0 / (sigma * sigma)
    ex = jnp.exp(-((xs - x) ** 2) * inv)
    ey = jnp.exp(-((ys - y) ** 2) * inv)
    e = ex * ey
    inside = (xs >= x_min) & (xs < x_max) & (ys >= y_min) & (ys < y_max)
    patches = jnp.where(
        visible.reshape(1, 1, -1) & inside & (e > threshold), e, 0.0
    )
    return patches, x0.reshape(-1), y0.reshape(-1)


def _conv5x5(x, kernel, pad: int = 2):
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(2, 2),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _prelu(x, alpha):
    return jnp.where(x >= 0, x, alpha * x)


def _accumulate_conv_patches(deltas, x0, y0, out_hw, dtype, impl="mm"):
    """Sum per-keypoint conv outputs into a +1-shifted [H/2, W/2] plane.

    deltas [N, K, OP, OP, 16] (OP = P/2 + 2), offsets [N, K] in input
    pixels.  Returns [N, H/2, W/2, 16].

    impl="mm" (default) places patches with one-hot separable matmuls:
    ``out[y,x,c] = Σ_{k,p} R[k,y,p]·(Σ_q deltas[k,p,q,c]·C[k,q,x])``
    where R/C are iota-compare one-hots — pure MXU work, no scatter.
    impl="dus" is the naive vmapped dynamic_update_slice loop; under
    vmap the batched start indices force XLA to full-plane selects per
    keypoint (~34x slower on TPU, kept as the oracle for tests).
    """
    n, k, op, _, co = deltas.shape
    h2, w2 = out_hw[0] // 2, out_hw[1] // 2

    if impl == "mm":
        def per_sample(d, xk, yk):
            xs = jax.lax.broadcasted_iota(jnp.int32, (k, op, w2 + 2), 2)
            cmat = (xs == (xk // 2)[:, None, None]
                    + jax.lax.broadcasted_iota(jnp.int32, (k, op, 1), 1)
                    ).astype(dtype)  # [K, OP, W2+2]
            ys = jax.lax.broadcasted_iota(jnp.int32, (k, h2 + 2, op), 1)
            rmat = (ys == (yk // 2)[:, None, None]
                    + jax.lax.broadcasted_iota(jnp.int32, (k, 1, op), 2)
                    ).astype(dtype)  # [K, H2+2, OP]
            bmat = jax.lax.dot_general(
                d, cmat,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            )  # [K, OP, C, W2+2]
            # contract (k, p) in one dot: out[y, (c, x)]
            r2 = jnp.transpose(rmat, (1, 0, 2)).reshape(h2 + 2, k * op)
            b2 = bmat.reshape(k * op, co * (w2 + 2))
            full = jnp.dot(r2, b2).reshape(h2 + 2, co, w2 + 2)
            return jnp.transpose(full, (0, 2, 1))[1:h2 + 1, 1:w2 + 1]

        return jax.vmap(per_sample)(deltas, x0, y0)

    def per_sample(deltas_k, x0_k, y0_k):
        buf = jnp.zeros((h2 + 2, w2 + 2, co), dtype)

        def body(i, buf):
            d = jax.lax.dynamic_index_in_dim(deltas_k, i, 0, keepdims=False)
            oy = y0_k[i] // 2   # +1-shifted: global offset is y0/2 - 1
            ox = x0_k[i] // 2
            cur = jax.lax.dynamic_slice(buf, (oy, ox, 0), (op, op, co))
            return jax.lax.dynamic_update_slice(buf, cur + d, (oy, ox, 0))

        return jax.lax.fori_loop(0, k, body, buf)

    buf = jax.vmap(per_sample)(deltas, x0, y0)
    return buf[:, 1:h2 + 1, 1:w2 + 1, :]


def _pooled_hm_planes(patches, x0, y0, out_hw, dtype, impl="mm"):
    """maxpool4 of the implied dense heatmap stack from pooled patches.

    patches [N, P, P, K] (already in the compute dtype), offsets
    [N, K] (mod 4).  Returns [N, H/4, W/4, K].

    impl="mm" (default) places each pooled tile with per-keypoint
    one-hot matmuls (k stays a batch dim — tiles land on disjoint
    planes, so placement is exact, not a reduction); impl="dus" is the
    naive vmapped dynamic_update_slice loop (slow on TPU, test oracle).
    """
    from instancesegmentation_tpu.models.layers import max_pool

    n, p, _, k = patches.shape
    h4, w4 = out_hw[0] // 4, out_hw[1] // 4
    pooled = max_pool(patches, 4, 4)  # [N, P/4, P/4, K]
    p4 = p // 4

    if impl == "mm":
        def per_sample(pp, xk, yk):
            xs = jax.lax.broadcasted_iota(jnp.int32, (k, p4, w4), 2)
            cmat = (xs == (xk // 4)[:, None, None]
                    + jax.lax.broadcasted_iota(jnp.int32, (k, p4, 1), 1)
                    ).astype(dtype)
            ys = jax.lax.broadcasted_iota(jnp.int32, (k, h4, p4), 1)
            rmat = (ys == (yk // 4)[:, None, None]
                    + jax.lax.broadcasted_iota(jnp.int32, (k, 1, p4), 2)
                    ).astype(dtype)
            pk = jnp.transpose(pp, (2, 0, 1))  # [K, P4, P4]
            bmat = jax.lax.dot_general(
                pk, cmat,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            )  # [K, P4, W4]
            full = jax.lax.dot_general(
                rmat, bmat,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            )  # [K, H4, W4]
            return jnp.transpose(full, (1, 2, 0))

        return jax.vmap(per_sample)(pooled, x0, y0)

    def per_sample(pooled_k, x0_k, y0_k):
        buf = jnp.zeros((h4, w4, k), dtype)

        def body(i, buf):
            tile = jax.lax.dynamic_slice(
                pooled_k, (0, 0, i), (p4, p4, 1)
            )
            return jax.lax.dynamic_update_slice(
                buf, tile, (y0_k[i] // 4, x0_k[i] // 4, i)
            )

        return jax.lax.fori_loop(0, k, body, buf)

    return jax.vmap(per_sample)(pooled, x0, y0)


def stem_hm_apply(
    images,
    points_xy,
    visible,
    stem: FoldedStemHM,
    dtype: Any = jnp.bfloat16,
    conv_impl: str = "gconv",
):
    """Folded conditioned stem: normalized RGB + keypoints →
    ``init_head_s4`` output [N, H/4, W/4, 36], never materializing the
    [H, W, 17] heatmap stack.

    images    [N, H, W, 3]  normalized, any float dtype
    points_xy [N, 17, 2]    keypoints in output-image coordinates
    visible   [N, 17] bool
    conv_impl "gconv" lowers the per-keypoint patch conv as one
              feature_group_count=17 conv; "dot" as 25 strided shifts
              + one k-batched dot_general on the MXU (grouped convs
              with tiny channel counts can lower poorly on TPU).

    Channel order matches InitHeadS4 (models/layers.py:232): pooled RGB
    (3), pooled heatmaps (17), conv features (16).  Feed the result to
    ``Segment.apply(..., skip_stem=True)``.
    """
    from instancesegmentation_tpu.models.layers import max_pool

    n, h, w, _ = images.shape
    out_hw = (h, w)
    xd = images.astype(dtype)

    patches, x0, y0 = jax.vmap(
        lambda p, v: render_heatmap_patches(p, v, out_hw)
    )(points_xy, visible)
    patches = patches.astype(dtype)  # same cast point as the dense path
    pp = patches.shape[1]
    k = patches.shape[-1]
    op = pp // 2 + 2

    # conv1: RGB conv + per-keypoint patch convs, placed and summed
    conv_img = _conv5x5(xd, stem.k1_img.astype(dtype))
    padded = jnp.pad(patches, ((0, 0), (4, 4), (4, 4), (0, 0)))
    if conv_impl == "gconv":
        grouped = jax.lax.conv_general_dilated(
            padded, stem.k1_hm.astype(dtype),
            window_strides=(2, 2),
            padding="VALID",
            feature_group_count=k,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # [N, OP, OP, 17*16]
        deltas = grouped.reshape(n, op, op, k, -1)
        deltas = jnp.transpose(deltas, (0, 3, 1, 2, 4))  # [N, K, OP, OP, 16]
    else:
        # im2col: 25 strided shifts -> [N, OP, OP, K, 25], then one
        # k-batched contraction against [K, 25, 16] on the MXU
        cols = jnp.stack(
            [
                padded[:, i:i + 2 * op - 1:2, j:j + 2 * op - 1:2, :]
                for i in range(5)
                for j in range(5)
            ],
            axis=-1,
        )
        k_dot = jnp.transpose(
            stem.k1_hm.reshape(5, 5, k, -1), (2, 0, 1, 3)
        ).reshape(k, 25, -1).astype(dtype)
        deltas = jax.lax.dot_general(
            cols, k_dot,
            dimension_numbers=(((4,), (1,)), ((3,), (0,))),
        )  # [K, N, OP, OP, 16]
        deltas = jnp.transpose(deltas, (1, 0, 2, 3, 4))
    conv1 = conv_img + _accumulate_conv_patches(
        deltas, x0, y0, out_hw, dtype
    )
    y = _prelu(conv1 + stem.b1.astype(dtype), stem.a1.astype(dtype))

    # conv2 (dense 16→16)
    y = _conv5x5(y, stem.k2.astype(dtype)) + stem.b2.astype(dtype)
    y = _prelu(y, stem.a2.astype(dtype))

    # maxpool4 shortcut: RGB pooled densely, heatmaps from patches
    short_img = max_pool(xd, 4, 4)
    short_hm = _pooled_hm_planes(patches, x0, y0, out_hw, dtype)
    return jnp.concatenate([short_img, short_hm, y], axis=-1)
