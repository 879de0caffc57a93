"""Proposal-to-ground-truth matching (detection Matcher semantics).

North-star capability (BASELINE.json "proposal matching").  Assigns
each proposal a ground-truth index and a label:

  label  1 (positive):   best IoU >= high_threshold
  label  0 (negative):   best IoU <  low_threshold
  label -1 (ignore):     in between

``allow_low_quality`` additionally force-matches, for every GT, the
proposal(s) achieving that GT's maximum IoU (so every GT gets at least
one positive) — the torchvision/Detectron "low quality matches" rule.
Fully vectorized, static shapes, jit/vmap-safe.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

POSITIVE = 1
NEGATIVE = 0
IGNORE = -1


@partial(jax.jit, static_argnames=("allow_low_quality",))
def match_proposals(
    iou: jax.Array,
    high_threshold: float = 0.5,
    low_threshold: float = 0.3,
    allow_low_quality: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """iou: [P, G] proposal-x-gt IoU matrix.

    Returns (matched_gt [P] int32, labels [P] int32).  With G == 0 the
    caller should treat everything as negative (an all-zero iou matrix
    yields exactly that).
    """
    best_iou = jnp.max(iou, axis=1)
    matched = jnp.argmax(iou, axis=1).astype(jnp.int32)

    labels = jnp.where(
        best_iou >= high_threshold,
        POSITIVE,
        jnp.where(best_iou < low_threshold, NEGATIVE, IGNORE),
    ).astype(jnp.int32)

    if allow_low_quality:
        # proposals achieving each GT's max IoU become positive,
        # keeping their original argmax assignment (torchvision rule)
        gt_best = jnp.max(iou, axis=0)  # [G]
        is_best_for_some_gt = jnp.any(
            (iou == gt_best[None, :]) & (gt_best[None, :] > 0), axis=1
        )
        labels = jnp.where(is_best_for_some_gt, POSITIVE, labels)

    return matched, labels


def match_proposals_pallas(
    iou: jax.Array,
    high_threshold: float = 0.5,
    low_threshold: float = 0.3,
    allow_low_quality: bool = True,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """``match_proposals`` as ONE Pallas kernel (north-star letter:
    "proposal matching ... written as Pallas kernels").

    Unlike NMS there is no sequential scan here — the XLA formulation
    is a single fused max/argmax pass and is already at the op's
    latency floor (CONFIRMED on chip: MATCH_PROBE.json measures XLA at
    0.93-1.08x a touch-the-input floor and this kernel at 0.83-1.08x
    XLA, i.e. noise — `tools/match_probe.py`, ROOFLINE.md section 5);
    this kernel exists to complete the Pallas op set and
    is bit-equivalent (first-argmax tie-breaking included, expressed as
    min-index-over-ties since Mosaic lacks a lane argmax).  Mosaic
    constraints: 2-D tiles, int32 iota, float masks.  [P, G] must fit
    VMEM (detection-sized inputs do).
    """
    from jax.experimental import pallas as pl

    p, g = iou.shape

    def kernel(iou_ref, matched_ref, labels_ref):
        x = iou_ref[...].astype(jnp.float32)
        best = jnp.max(x, axis=1, keepdims=True)            # [P, 1]
        cols = jax.lax.broadcasted_iota(jnp.int32, (p, g), 1)
        # first index achieving the row max == jnp.argmax tie-breaking
        cand = jnp.where(x == best, cols, jnp.int32(g))
        matched_ref[...] = jnp.min(cand, axis=1, keepdims=True)
        labels = jnp.where(
            best >= high_threshold,
            jnp.int32(POSITIVE),
            jnp.where(best < low_threshold, jnp.int32(NEGATIVE),
                      jnp.int32(IGNORE)),
        )
        if allow_low_quality:
            gt_best = jnp.max(x, axis=0, keepdims=True)      # [1, G]
            hit = ((x == gt_best) & (gt_best > 0)).astype(jnp.float32)
            is_best = jnp.max(hit, axis=1, keepdims=True) > 0
            labels = jnp.where(is_best, jnp.int32(POSITIVE), labels)
        labels_ref[...] = labels

    matched, labels = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((p, 1), jnp.int32),
            jax.ShapeDtypeStruct((p, 1), jnp.int32),
        ),
        interpret=interpret,
    )(iou)
    return matched[:, 0], labels[:, 0]


def subsample_labels(
    labels: jax.Array,
    rng: jax.Array,
    batch_size: int,
    positive_fraction: float = 0.25,
) -> jax.Array:
    """Randomly keep ~batch_size labels with the given positive
    fraction; the rest become IGNORE.  Static-shape friendly: returns a
    new labels array (no index lists).
    """
    pos = labels == POSITIVE
    neg = labels == NEGATIVE
    num_pos_target = int(batch_size * positive_fraction)

    r_pos, r_neg = jax.random.split(rng)

    def pick(mask, target, r):
        noise = jax.random.uniform(r, mask.shape)
        # rank eligible entries by noise; keep the `target` smallest
        score = jnp.where(mask, noise, 2.0)
        quota = jnp.minimum(target, jnp.sum(mask))
        kth = jnp.sort(score)[jnp.maximum(quota - 1, 0)]
        return mask & (score <= kth) & (quota > 0)

    keep_pos = pick(pos, num_pos_target, r_pos)
    num_pos = jnp.sum(keep_pos)
    keep_neg = pick(neg, batch_size - num_pos, r_neg)

    out = jnp.full_like(labels, IGNORE)
    out = jnp.where(keep_pos, POSITIVE, out)
    out = jnp.where(keep_neg, NEGATIVE, out)
    return out
