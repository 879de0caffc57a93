"""RoI-Align on TPU (XLA + Pallas variants).

A BASELINE.json north-star capability with no counterpart in the
reference code (SURVEY.md §7 step 7): torchvision-semantics RoI-Align
built TPU-first.

Key idea: RoI-Align is *separable linear interpolation* — every output
bin is an average of ``sampling_ratio^2`` bilinear samples, and both the
sampling and the averaging are linear in the feature map.  So the whole
op for one ROI collapses to two small matmuls:

    out[oh, ow, C] = W_y  @  feat[H, W, C]  @  W_x^T

where ``W_y [oh, H]``/``W_x [ow, W]`` fold the bilinear weights AND the
intra-bin average.  That turns a gather-heavy op into MXU contractions —
the right shape for TPU (no scatter/gather in the hot path).

Semantics match ``torchvision.ops.roi_align``: ``aligned=True`` applies
the -0.5 half-pixel offset; samples with center outside ``[-1, size]``
contribute zero; in-range coords clamp to ``[0, size-1]``;
``sampling_ratio<=0`` (adaptive ceil(roi/out)) is not supported — pass
an explicit ratio.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _interp_weights(starts, bin_size, size: int, out_dim: int, ratio: int):
    """Averaged bilinear weight matrix [out_dim, size] for one axis.

    starts: [R] roi start coordinate per ROI (already offset).
    bin_size: [R] roi bin size per ROI.
    Returns [R, out_dim, size].
    """
    # sample centers: start + (o + (s + 0.5)/ratio) * bin
    o = jnp.arange(out_dim, dtype=jnp.float32)[:, None]      # [out, 1]
    s = (jnp.arange(ratio, dtype=jnp.float32) + 0.5) / ratio  # [ratio]
    centers = (
        starts[:, None, None]
        + (o + s[None, :]) * bin_size[:, None, None]
    )  # [R, out, ratio]

    size_f = float(size)
    valid = (centers >= -1.0) & (centers <= size_f)
    cc = jnp.clip(centers, 0.0, size_f - 1.0)
    grid = jnp.arange(size, dtype=jnp.float32)  # [size]
    # bilinear hat kernel around the clamped center
    w = jnp.maximum(0.0, 1.0 - jnp.abs(cc[..., None] - grid))  # [R,out,ratio,size]
    w = jnp.where(valid[..., None], w, 0.0)
    # exact-right-edge case: center == size-1 gives weight 1 on the last
    # cell already (|d|=0); general hat handles all interior cases
    return w.mean(axis=2)  # average over samples -> [R, out, size]


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio", "aligned"))
def roi_align(
    features: jax.Array,
    boxes: jax.Array,
    box_indices: jax.Array,
    output_size: tuple[int, int] = (7, 7),
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jax.Array:
    """XLA RoI-Align.

    features:    [N, H, W, C]
    boxes:       [R, 4] xyxy in input coordinates
    box_indices: [R] image index per ROI
    returns      [R, oh, ow, C]
    """
    n, h, w, c = features.shape
    oh, ow = output_size
    offset = 0.5 if aligned else 0.0
    b = boxes.astype(jnp.float32) * spatial_scale - offset

    x0, y0, x1, y1 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    roi_w = x1 - x0
    roi_h = y1 - y0
    if not aligned:  # legacy: clamp roi size to >= 1
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / ow
    bin_h = roi_h / oh

    wy = _interp_weights(y0, bin_h, h, oh, sampling_ratio)  # [R, oh, H]
    wx = _interp_weights(x0, bin_w, w, ow, sampling_ratio)  # [R, ow, W]

    feats = features[box_indices]  # [R, H, W, C]
    tmp = jnp.einsum("ryh,rhwc->rywc", wy, feats.astype(jnp.float32))
    return jnp.einsum("rxw,rywc->ryxc", wx, tmp)


def roi_align_pallas(
    features: jax.Array,
    boxes: jax.Array,
    box_indices: jax.Array,
    output_size: tuple[int, int] = (7, 7),
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Pallas RoI-Align: one grid program per ROI.

    ``box_indices`` ride the scalar-prefetch channel so each program's
    feature block (its ROI's image) is DMA'd by the BlockSpec index_map
    before the kernel body runs.  Inside, the two averaged-bilinear
    weight matrices are built on the VPU and the per-channel
    contractions run on the MXU.  Mosaic-friendly shape discipline: the
    kernel works channel-major ([C, H, W] blocks) so every load, dot
    and store is a contiguous 2-D tile — no 3-D reshapes, no minor-dim
    inserts on sub-32-bit types.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, c = features.shape
    r = boxes.shape[0]
    oh, ow = output_size
    offset = 0.5 if aligned else 0.0
    feats_chw = jnp.transpose(features.astype(jnp.float32), (0, 3, 1, 2))

    def kernel(idx_ref, boxes_ref, feat_ref, out_ref):
        rid = pl.program_id(0)
        x0 = boxes_ref[rid, 0] * spatial_scale - offset
        y0 = boxes_ref[rid, 1] * spatial_scale - offset
        x1 = boxes_ref[rid, 2] * spatial_scale - offset
        y1 = boxes_ref[rid, 3] * spatial_scale - offset
        roi_w = x1 - x0
        roi_h = y1 - y0
        if not aligned:
            roi_w = jnp.maximum(roi_w, 1.0)
            roi_h = jnp.maximum(roi_h, 1.0)

        def weights(start, bin_size, size, out_dim, transpose):
            """Averaged bilinear weights, [out_dim, size] (or transposed).

            2-D only: one static python accumulation per sample point.
            """
            shape = (size, out_dim) if transpose else (out_dim, size)
            o_axis = 1 if transpose else 0
            o = jax.lax.broadcasted_iota(jnp.int32, shape, o_axis).astype(
                jnp.float32
            )
            grid = jax.lax.broadcasted_iota(
                jnp.int32, shape, 1 - o_axis
            ).astype(jnp.float32)
            acc = jnp.zeros(shape, jnp.float32)
            for s in range(sampling_ratio):
                centers = start + (o + (s + 0.5) / sampling_ratio) * bin_size
                valid = (
                    (centers >= -1.0) & (centers <= float(size))
                ).astype(jnp.float32)
                cc = jnp.clip(centers, 0.0, float(size) - 1.0)
                acc = acc + valid * jnp.maximum(0.0, 1.0 - jnp.abs(cc - grid))
            return acc / sampling_ratio

        wy = weights(y0, roi_h / oh, h, oh, transpose=False)  # [oh, H]
        wxt = weights(x0, roi_w / ow, w, ow, transpose=True)  # [W, ow]

        for ch in range(c):
            feat_c = feat_ref[0, ch]  # [H, W]
            tmp = jax.lax.dot_general(
                wy, feat_c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [oh, W]
            out_ref[0, ch] = jax.lax.dot_general(
                tmp, wxt, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [oh, ow]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # box_indices, boxes
        grid=(r,),
        in_specs=[
            pl.BlockSpec(
                (1, c, h, w),
                lambda rid, idx_ref, boxes_ref: (idx_ref[rid], 0, 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, c, oh, ow), lambda rid, idx_ref, boxes_ref: (rid, 0, 0, 0)
        ),
    )

    out_chw = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((r, c, oh, ow), jnp.float32),
        interpret=interpret,
    )(box_indices.astype(jnp.int32), boxes.astype(jnp.float32), feats_chw)
    return jnp.transpose(out_chw, (0, 2, 3, 1))


def roi_align_numpy(features, boxes, box_indices, output_size, spatial_scale=1.0,
                    sampling_ratio=2, aligned=True):
    """Direct numpy port of the torchvision roi_align algorithm (the
    golden oracle; torchvision itself is not installed here)."""
    n, h, w, c = features.shape
    oh, ow = output_size
    offset = 0.5 if aligned else 0.0
    r = boxes.shape[0]
    out = np.zeros((r, oh, ow, c), dtype=np.float64)

    def bilinear(img, y, x):
        if y < -1.0 or y > h or x < -1.0 or x > w:
            return np.zeros(c)
        y = min(max(y, 0.0), h - 1)
        x = min(max(x, 0.0), w - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1, x1 = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        ly, lx = y - y0, x - x0
        return (
            img[y0, x0] * (1 - ly) * (1 - lx)
            + img[y0, x1] * (1 - ly) * lx
            + img[y1, x0] * ly * (1 - lx)
            + img[y1, x1] * ly * lx
        )

    for ri in range(r):
        img = features[box_indices[ri]]
        bx0, by0, bx1, by1 = boxes[ri] * spatial_scale - offset
        roi_w, roi_h = bx1 - bx0, by1 - by0
        if not aligned:
            roi_w, roi_h = max(roi_w, 1.0), max(roi_h, 1.0)
        bw, bh = roi_w / ow, roi_h / oh
        for oy in range(oh):
            for ox in range(ow):
                acc = np.zeros(c)
                for sy in range(sampling_ratio):
                    for sx in range(sampling_ratio):
                        y = by0 + (oy + (sy + 0.5) / sampling_ratio) * bh
                        x = bx0 + (ox + (sx + 0.5) / sampling_ratio) * bw
                        acc += bilinear(img, y, x)
                out[ri, oy, ox] = acc / (sampling_ratio**2)
    return out.astype(np.float32)
