"""Batched NMS on TPU with static shapes.

North-star capability (BASELINE.json: "batched NMS ... written as
kernels instead of torchvision ops").  TPU-first design: no dynamic
shapes — NMS returns a keep MASK plus score-ordered indices padded to a
static ``max_outputs``, so downstream code stays jittable.  Suppression
is the classic sequential scan expressed as a ``fori_loop`` over the
score-sorted IoU matrix: iteration i kills every lower-scored box with
IoU > threshold against a surviving box i.  O(N^2) vector work on the
VPU — optimal for detection-sized N (<= a few thousand), and batchable
via vmap.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def box_iou_jnp(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise IoU of [N,4] x [M,4] xyxy boxes -> [N,M] (float32)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[:, 2] - a[:, 0], 0, None) * jnp.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = jnp.clip(b[:, 2] - b[:, 0], 0, None) * jnp.clip(b[:, 3] - b[:, 1], 0, None)
    union = area_a[:, None] + area_b[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


@partial(jax.jit, static_argnames=("max_outputs",))
def nms(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float = 0.5,
    max_outputs: int | None = None,
    score_threshold: float = -jnp.inf,
) -> tuple[jax.Array, jax.Array]:
    """Single-image NMS.

    Returns ``(indices [K], valid [K])`` where K = max_outputs (default
    N): score-descending indices of kept boxes, padded with -1 where
    ``valid`` is False.  Matches torchvision.ops.nms ordering (strictly
    greater-than suppression).
    """
    n = boxes.shape[0]
    k = n if max_outputs is None else max_outputs
    order = jnp.argsort(-scores, stable=True)
    sboxes = boxes[order]
    sscores = scores[order]

    iou = box_iou_jnp(sboxes, sboxes)
    alive0 = sscores > score_threshold

    def body(i, alive):
        # if box i survived, kill every later box overlapping it
        kill = (iou[i] > iou_threshold) & (jnp.arange(n) > i) & alive[i]
        return alive & ~kill

    alive = jax.lax.fori_loop(0, n, body, alive0)

    # top-k surviving, in score order (stable sort keeps order); pad
    # with invalid entries when k > n so the static-shape contract holds
    rank = jnp.where(alive, jnp.arange(n), n + jnp.arange(n))
    take = jnp.argsort(rank)
    valid = alive[take]
    indices = jnp.where(valid, order[take], -1)
    if k > n:
        indices = jnp.pad(indices, (0, k - n), constant_values=-1)
        valid = jnp.pad(valid, (0, k - n), constant_values=False)
    return indices[:k], valid[:k]


@partial(jax.jit, static_argnames=("max_outputs",))
def batched_nms(
    boxes: jax.Array,
    scores: jax.Array,
    class_ids: jax.Array,
    iou_threshold: float = 0.5,
    max_outputs: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Class-aware NMS via the coordinate-offset trick
    (torchvision.ops.batched_nms): boxes of different classes never
    suppress each other."""
    max_coord = jnp.max(boxes) + 1.0
    offsets = class_ids.astype(jnp.float32)[:, None] * max_coord
    return nms(boxes + offsets, scores, iou_threshold, max_outputs)


def nms_batch(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float = 0.5,
    max_outputs: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """vmap over a leading batch axis: [B,N,4] x [B,N] -> ([B,K], [B,K])."""
    return jax.vmap(lambda b, s: nms(b, s, iou_threshold, max_outputs))(boxes, scores)


@partial(jax.jit, static_argnames=("max_outputs", "interpret"))
def nms_pallas(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float = 0.5,
    max_outputs: int | None = None,
    score_threshold: float = -jnp.inf,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """``nms`` with the sequential suppression scan as ONE Pallas kernel.

    The XLA formulation above runs the N-iteration scan as an XLA while
    loop: each iteration is a separately scheduled fused op over an
    HBM-resident row — pure per-iteration dispatch latency for bodies
    this small.  Here XLA still does the sort and builds the boolean
    suppression matrix (one fused O(N^2) VPU pass), and the scan runs
    inside a single kernel over VMEM: iteration i reads suppression row
    i ([1, N] dynamic slice), ANDs it into the alive vector — no HBM
    round-trips, no per-iteration dispatch.

    Mosaic constraints respected (CLAUDE.md): 2-D tiles only, int32
    iota, float 0/1 masks instead of bool stores.  N x N f32 must fit
    VMEM: N <= ~1500 — above that use ``nms`` (the proposal pipeline
    caps far below this).  Same return contract as ``nms``.
    """
    from jax.experimental import pallas as pl

    n = boxes.shape[0]
    if n > 1408:
        # N x N f32 suppression matrix would crowd the ~16 MB VMEM;
        # static-shape fallback to the XLA scan (trace-time branch)
        return nms(boxes, scores, iou_threshold, max_outputs,
                   score_threshold)
    k = n if max_outputs is None else max_outputs
    order = jnp.argsort(-scores, stable=True)
    sboxes = boxes[order]
    sscores = scores[order]

    suppress = (box_iou_jnp(sboxes, sboxes) > iou_threshold).astype(jnp.float32)
    alive0 = (sscores > score_threshold).astype(jnp.float32)[None, :]

    def kernel(sup_ref, alive0_ref, alive_ref):
        alive_ref[...] = alive0_ref[...]
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

        def body(i, _):
            alive = alive_ref[...]
            # element i of the alive vector without dynamic_slice (Mosaic
            # can't lower dynamic_slice on values — only ref dslices):
            # mask-and-reduce against the iota instead
            a_i = jnp.sum(
                alive * (cols == i).astype(jnp.float32), axis=1, keepdims=True
            )
            row = sup_ref[pl.dslice(i, 1), :]
            kill = row * a_i * (cols > i).astype(jnp.float32)
            alive_ref[...] = alive * (1.0 - kill)
            return 0

        jax.lax.fori_loop(0, n, body, 0)

    alive_f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        interpret=interpret,
    )(suppress, alive0)
    alive = alive_f[0] > 0.5

    rank = jnp.where(alive, jnp.arange(n), n + jnp.arange(n))
    take = jnp.argsort(rank)
    valid = alive[take]
    indices = jnp.where(valid, order[take], -1)
    if k > n:
        indices = jnp.pad(indices, (0, k - n), constant_values=-1)
        valid = jnp.pad(valid, (0, k - n), constant_values=False)
    return indices[:k], valid[:k]


def nms_numpy(boxes, scores, iou_threshold):
    """Greedy reference NMS (golden oracle, torchvision semantics):
    walk boxes in descending score order; a surviving box suppresses
    every later box with IoU strictly greater than the threshold."""
    import numpy as np

    def iou(i, j):
        xx0 = max(boxes[i, 0], boxes[j, 0])
        yy0 = max(boxes[i, 1], boxes[j, 1])
        xx1 = min(boxes[i, 2], boxes[j, 2])
        yy1 = min(boxes[i, 3], boxes[j, 3])
        inter = max(0.0, xx1 - xx0) * max(0.0, yy1 - yy0)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area_j = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
        union = area_i + area_j - inter
        return inter / union if union > 0 else 0.0

    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    for pos, i in enumerate(order):
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order[pos + 1 :]:
            if not suppressed[j] and iou(i, j) > iou_threshold:
                suppressed[j] = True
    return np.asarray(keep)
