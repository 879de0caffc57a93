"""Batching, host->device prefetch, and the device-side preprocessing
program.

``preprocess_batch`` is the compiled replacement for the reference's
per-worker imgaug chain + ToTensor/Normalize + heatmap loop (reference
train_instance.py:129-213): one jitted function from canvas-uint8
batches to normalized model inputs, soft mask targets and keypoint
heatmaps.  It is called *inside* the train/eval step so XLA fuses the
whole input program with the model ("show_aug.py augmentations compiled
into the graph", BASELINE.json north star).

Host side, ``batch_iterator`` decodes PNGs with a thread pool (cv2
releases the GIL) and a background prefetch thread keeps one batch
ahead, giving double-buffered host->HBM transfer against the async XLA
dispatch.
"""
from __future__ import annotations

import dataclasses
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from instancesegmentation_tpu.core.keys import ORDER_PART_NAMES
from instancesegmentation_tpu.data.dataset import InstanceCommonDataset, Sample
from instancesegmentation_tpu.ops.heatmap import render_heatmaps
from instancesegmentation_tpu.ops.warp import (
    WarpParams,
    flip_params_x,
    instance_warp_params,
    warp_image,
    warp_points,
)

#: channel permutation under horizontal flip: left<->right parts swap
#: (canonical ORDER_PART_NAMES order, core/keys.py)
_FLIP_PERM = tuple(
    ORDER_PART_NAMES.index(
        part.replace("left_", "@").replace("right_", "left_").replace("@", "right_")
    )
    for part in ORDER_PART_NAMES
)


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Device-side augmentation knobs.

    Reference-parity defaults: everything off (the reference's flip /
    scale-jitter / photometric augs are commented out, SURVEY.md §2.9).
    BASELINE.json asks for them as enabled *options* for training runs.
    """

    out_size: tuple[int, int] = (480, 480)
    pad: int = 16
    flip_prob: float = 0.0
    jitter: float = 0.0            # window jitter fraction (+-)
    rotate: float = 0.0            # max rotation degrees (+-); the
                                   # reference's commented-out
                                   # sometimes(0.6, Affine(rotate=(-25,25)))
                                   # (train_instance.py:139-155).  0 keeps
                                   # the separable MXU warp; >0 switches
                                   # the batch to the gather-based rotated
                                   # sampler (ops/warp.warp_image_rotated)
    rotate_prob: float = 0.6       # per-sample probability a rotation is
                                   # applied (imgaug Sometimes(0.6, ...))
    rotate_chunk: int = 0          # stage the rotated warp in chunks of
                                   # this many samples (lax.map
                                   # batch_size) instead of one
                                   # full-batch vmap.  Numerically
                                   # identical (per-sample ops, no
                                   # cross-batch math); bounds the live
                                   # per-sample intermediates.  0 = impl
                                   # default: full-batch vmap for
                                   # "gather", 4 for "2pass" (whose
                                   # banded one-hot tensors are ~786 MB
                                   # f32 per sample at 640→480 and MUST
                                   # be staged — ROOFLINE.md §7).
    rotate_impl: str = "2level"    # rotated sampler: "2level" =
                                   # blocked two-level form
                                   # (warp_image_rotated_2level: hats
                                   # generated per rotate_block rows +
                                   # banded residual shift — block×
                                   # fewer hat elements; DEFAULT per
                                   # chip measurement: 156 vs 469
                                   # µs/img preprocess, rotated train
                                   # 1,842 vs 1,153 img/s at batch
                                   # 128, quality parity at 5 seeds —
                                   # ROOFLINE.md §Round-5,
                                   # examples/rot_quality_sweep192.json);
                                   # "2pass" = unblocked banded
                                   # one-hot matmul two-pass affine
                                   # (warp_image_rotated_2pass — the
                                   # exact per-tap form, 6× the gather,
                                   # ROT_GATHER_VARIANTS.json);
                                   # "gather" = per-pixel 4-tap gather
                                   # (ops/warp.warp_image_rotated,
                                   # bit-matches the one-pass bilinear
                                   # oracle).  θ=0 all reduce exactly
                                   # to the separable fast path.
    rotate_block: int = 16         # "2level" hat block size (rows per
                                   # shared hat); larger = fewer hat
                                   # elements but a wider residual band
    brightness: float = 0.0        # multiplicative range +- (e.g. 0.2)
    contrast: float = 0.0          # linear contrast range +-
    noise_std: float = 0.0         # additive gaussian noise std (0..255)
    out_dtype: object = None       # images/heatmaps output dtype; None =
                                   # float32.  Pass the model compute
                                   # dtype (bf16) so XLA fuses the cast
                                   # into the warp/render producers and
                                   # the pipeline's largest tensors
                                   # ([oh,ow,17] heatmaps) are written
                                   # to HBM at half width.  Geometry and
                                   # the loss-target masks stay f32.


def host_batch(samples: list[Sample]) -> dict:
    """Stack host samples into one numpy batch dict."""
    return {
        "image": np.stack([s.image for s in samples]),
        "mask": np.stack([s.mask for s in samples]),
        "image_hw": np.stack([s.image_hw for s in samples]),
        "obj_box": np.stack([s.obj_box for s in samples]),
        "mask_box": np.stack([s.mask_box for s in samples]),
        "mask_valid": np.asarray([s.mask_valid for s in samples], dtype=bool),
        "keypoints": np.stack([s.keypoints for s in samples]),
    }


def preprocess_batch(batch: dict, rng: jax.Array, cfg: AugmentConfig):
    """Device-side: canvas batch -> (images, heatmaps, masks).

    images   [B, oh, ow, 3]  float32 in [-1, 1]
    heatmaps [B, oh, ow, 17] float32 in [0, 1]
    masks    [B, oh, ow, 1]  float32 in [0, 1] (soft, bilinear-resampled
             like the reference's interpolated mask targets)
    """
    from instancesegmentation_tpu.ops.warp import (
        center_translation,
        clipped_mask_box,
    )

    out_hw = cfg.out_size
    out_h, out_w = out_hw
    b = batch["image"].shape[0]
    r_jit, r_flip, r_bri, r_con, r_noise = jax.random.split(rng, 5)

    obj_box = batch["obj_box"].astype(jnp.float32)
    image_hw = batch["image_hw"].astype(jnp.float32)
    # exact bbox of the mask pixels surviving the centering translation
    # (the reference recomputes mask2box on the translated mask; a plain
    # clip(bbox + t) is wider for non-rectangular masks near the edge)
    t = jax.vmap(center_translation)(obj_box, image_hw)

    jitter = (
        jax.random.uniform(r_jit, (b, 4), minval=-cfg.jitter, maxval=cfg.jitter)
        if cfg.jitter > 0
        else None
    )
    flip = (
        jax.random.bernoulli(r_flip, cfg.flip_prob, (b,))
        if cfg.flip_prob > 0
        else jnp.zeros((b,), bool)
    )

    if cfg.rotate > 0:
        # rotated chain: translate -> rotate-about-center -> crop+resize,
        # sampled by the 4-tap gather path (ops/warp.py rotation section)
        import math

        from instancesegmentation_tpu.ops.warp import (
            flip_rot_params_x,
            rotated_instance_warp_params,
            rotated_mask_box,
            warp_image_rotated,
            warp_points_rotated,
        )

        # fresh streams via fold_in: the 5-way split above keeps its
        # exact layout so seeds reproduce across configs
        gate = jax.random.bernoulli(
            jax.random.fold_in(rng, 101), cfg.rotate_prob, (b,)
        )
        theta = jnp.where(
            gate,
            jax.random.uniform(
                jax.random.fold_in(rng, 102), (b,), minval=-1.0, maxval=1.0
            ) * (cfg.rotate * math.pi / 180.0),
            0.0,
        )
        rot_box, rot_valid = jax.vmap(rotated_mask_box)(
            batch["mask"], t, theta, image_hw
        )
        if jitter is not None:
            params = jax.vmap(
                lambda ob, rb, hw, th, rv, j: rotated_instance_warp_params(
                    ob, rb, hw, th, out_hw, cfg.pad, rv, j
                )
            )(obj_box, rot_box, image_hw, theta, rot_valid, jitter)
        else:
            params = jax.vmap(
                lambda ob, rb, hw, th, rv: rotated_instance_warp_params(
                    ob, rb, hw, th, out_hw, cfg.pad, rv
                )
            )(obj_box, rot_box, image_hw, theta, rot_valid)
        base_params = params
        flipped = jax.vmap(lambda p: flip_rot_params_x(p, out_w))(params)
        params = params._replace(
            scale=jnp.where(flip[:, None], flipped.scale, params.scale),
            origin=jnp.where(flip[:, None], flipped.origin, params.origin),
        )
        # the two-pass samplers divide by cosθ·scale (degenerate near
        # 90°, ops/warp.py); max |θ| is the static cfg.rotate, so the
        # gather fallback is a trace-time decision
        impl = cfg.rotate_impl
        if impl not in ("2pass", "2level", "gather"):
            raise ValueError(f"unknown rotate_impl: {impl!r}")
        if impl != "gather" and cfg.rotate >= 60.0:
            impl = "gather"
        if impl in ("2pass", "2level"):
            from instancesegmentation_tpu.ops.warp import (
                warp_image_rotated_2level,
                warp_image_rotated_2pass,
            )

            if impl == "2pass":
                def _warp_both(both, p):
                    return warp_image_rotated_2pass(both, p, out_hw)
            else:
                def _warp_both(both, p):
                    return warp_image_rotated_2level(
                        both, p, out_hw, theta_max_deg=cfg.rotate,
                        block=cfg.rotate_block,
                    )

            def _warp_pair(img, mask, p):
                # one shared warp: image+mask concatenated so the
                # banded one-hot tensors are generated once per sample
                both = _warp_both(
                    jnp.concatenate(
                        [img.astype(jnp.float32),
                         mask[..., None].astype(jnp.float32)], axis=-1
                    ),
                    p,
                )
                return both[..., :3], both[..., 3:]
        else:
            def _warp_pair(img, mask, p):
                return (
                    warp_image_rotated(img.astype(jnp.float32), p, out_hw),
                    warp_image_rotated(
                        mask[..., None].astype(jnp.float32), p, out_hw
                    ),
                )

        # staged execution: lax.map(batch_size=k) scans chunk-vmapped
        # warps so at most k samples' intermediates are live at once.
        # Mandatory for 2pass (its per-sample one-hot tensors are
        # ~786 MB f32 at 640→480; 2level's are ~block× smaller but the
        # residual-shift slices still transiently multiply the canvas);
        # optional memory bound for gather.  chunk 4 for both matmul
        # impls per chip measurement: 2level unstaged at batch 8 ran
        # 149 img/s vs 304 staged, and chunk 4 ≥ chunk 8 at batch 128
        # (1,842 vs 1,829 img/s — ROOFLINE.md §Round-5).
        chunk = cfg.rotate_chunk or {"2pass": 4, "2level": 4}.get(impl, 0)
        if chunk and b > chunk:
            images, masks = jax.lax.map(
                lambda t3: _warp_pair(*t3),
                (batch["image"], batch["mask"], params),
                batch_size=chunk,
            )
        else:
            images, masks = jax.vmap(_warp_pair)(
                batch["image"], batch["mask"], params
            )
        kps = batch["keypoints"].astype(jnp.float32)
        pts = jax.vmap(warp_points_rotated)(kps[..., :2], base_params)
    else:
        # (computed here, not above: the rotated branch derives its own
        # rotated-frame box and this O(canvas^2) reduction would be
        # dead weight for eager callers like tools/show_aug.py)
        mask_box, mask_valid = jax.vmap(clipped_mask_box)(
            batch["mask"], t, image_hw
        )
        box_args = (obj_box, mask_box, image_hw, mask_valid)
        if jitter is not None:
            params = jax.vmap(
                lambda ob, mb, hw, mv, j: instance_warp_params(
                    ob, mb, hw, out_hw, cfg.pad, mv, j
                )
            )(*box_args, jitter)
        else:
            params = jax.vmap(
                lambda ob, mb, hw, mv: instance_warp_params(ob, mb, hw, out_hw, cfg.pad, mv)
            )(*box_args)

        base_params = params  # unflipped: keypoints map through these
        flipped = jax.vmap(lambda s, o, lo, hi: flip_params_x(WarpParams(s, o, lo, hi), out_w))(
            params.scale, params.offset, params.src_lo, params.src_hi
        )
        params = WarpParams(
            scale=jnp.where(flip[:, None], flipped.scale, params.scale),
            offset=jnp.where(flip[:, None], flipped.offset, params.offset),
            src_lo=params.src_lo,
            src_hi=params.src_hi,
        )

        def warp_one(img, mask, s, o, lo, hi):
            p = WarpParams(s, o, lo, hi)
            im = warp_image(img.astype(jnp.float32), p, out_hw)
            mk = warp_image(mask[..., None].astype(jnp.float32), p, out_hw)
            return im, mk

        images, masks = jax.vmap(warp_one)(
            batch["image"], batch["mask"], params.scale, params.offset,
            params.src_lo, params.src_hi,
        )
        kps = batch["keypoints"].astype(jnp.float32)
        pts = jax.vmap(lambda p_xy, s, o: warp_points(p_xy, WarpParams(s, o)))(
            kps[..., :2], base_params.scale, base_params.offset
        )

    # photometric augs on the [0, 255] scale (imgaug semantics:
    # Multiply / LinearContrast / AdditiveGaussianNoise, ref :188-191)
    if cfg.brightness > 0:
        m = jax.random.uniform(
            r_bri, (b, 1, 1, 1), minval=1 - cfg.brightness, maxval=1 + cfg.brightness
        )
        images = images * m
    if cfg.contrast > 0:
        c = jax.random.uniform(
            r_con, (b, 1, 1, 1), minval=1 - cfg.contrast, maxval=1 + cfg.contrast
        )
        images = (images - 127.5) * c + 127.5
    if cfg.noise_std > 0:
        images = images + cfg.noise_std * jax.random.normal(r_noise, images.shape)

    images = jnp.clip(images, 0.0, 255.0) / 127.5 - 1.0  # ToTensor+Normalize(.5,.5)
    # clip: bilinear tap-weight sums can overshoot 1 by ~1e-7 (targets
    # must stay valid BCE probabilities)
    masks = jnp.clip(masks / 255.0, 0.0, 1.0)

    # keypoints were mapped above through the UNFLIPPED params; mirror
    # them in output space here (x' = (w-1) - x, matching the pixel
    # flip; mapping through flipped params would misalign by one pixel
    # because warp_points' imgaug convention needs positive scales)
    vis = kps[..., 2] > 0.5

    perm = jnp.asarray(_FLIP_PERM)
    pts_f = jnp.stack(
        [(out_w - 1.0) - pts[:, perm, 0], pts[:, perm, 1]], axis=-1
    )
    vis_f = vis[:, perm]
    pts = jnp.where(flip[:, None, None], pts_f, pts)
    vis = jnp.where(flip[:, None], vis_f, vis)

    heatmaps = jax.vmap(lambda p, v: render_heatmaps(p, v, out_hw))(pts, vis)

    if cfg.out_dtype is not None:
        # model inputs only: the first conv casts to the compute dtype
        # anyway (flax promotes inputs to module dtype), so rounding
        # here is value-identical to rounding there — but the tensors
        # cross HBM at half width.  Masks are BCE targets and keep f32.
        images = images.astype(cfg.out_dtype)
        heatmaps = heatmaps.astype(cfg.out_dtype)

    return images, heatmaps, masks


def device_prefetch(iterator: Iterator[dict], depth: int = 2, sharding=None) -> Iterator[dict]:
    """Keep ``depth`` batches in flight to the device ahead of the
    consumer (double-buffered host->HBM transfer).

    ``jax.device_put`` is async, so while the train step computes batch
    n the transfer of batch n+1 proceeds; pass a NamedSharding to land
    batches pre-sharded across a mesh.  Under multi-host DP each host's
    iterator carries only its local rows; they are assembled into global
    arrays with ``jax.make_array_from_process_local_data`` (no
    cross-host data motion — every host feeds its own devices).
    """
    import collections

    if sharding is not None and jax.process_count() > 1:

        def put(b):
            return {
                k: jax.make_array_from_process_local_data(
                    sharding, np.asarray(v)
                )
                for k, v in b.items()
            }

    elif sharding is not None:
        put = lambda b: jax.device_put(b, sharding)
    else:
        put = jax.device_put
    queue_: collections.deque = collections.deque()
    for item in iterator:
        queue_.append(put(item))
        if len(queue_) >= depth:
            yield queue_.popleft()
    while queue_:
        yield queue_.popleft()


def batch_iterator(
    dataset: InstanceCommonDataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    epochs: Optional[int] = 1,
    drop_last: bool = True,
    num_threads: int = 8,
    prefetch: int = 2,
    local_slice: Optional[slice] = None,
) -> Iterator[dict]:
    """Yield host batch dicts with threaded decode and background prefetch.

    ``epochs=None`` streams forever.  Incomplete tail batches are
    dropped when ``drop_last`` (static shapes for XLA) else padded by
    repeating the first sample.

    ``local_slice`` (multi-host DP, parallel/multihost.local_batch_slice):
    every process derives the identical global batch order from ``seed``,
    then decodes and yields ONLY its row range of each global batch —
    loader-side sharding with no duplicated decode work.  Tail padding is
    applied to the global batch before slicing, so the global row layout
    (pad rows at the END) is identical to the single-process case.
    """
    rng = np.random.default_rng(seed)
    pool = ThreadPoolExecutor(max_workers=num_threads)
    q: queue.Queue = queue.Queue(maxsize=prefetch)
    stop = threading.Event()

    def order_stream():
        epoch = 0
        while epochs is None or epoch < epochs:
            order = np.arange(len(dataset))
            if shuffle:
                rng.shuffle(order)
            yield from (
                order[i : i + batch_size]
                for i in range(0, len(order), batch_size)
            )
            epoch += 1

    def try_put(item) -> bool:
        # never block forever: an abandoned consumer sets `stop`, and a
        # producer stuck in q.put on a full queue would leak the thread
        # plus its decoded batches
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for idxs in order_stream():
                if stop.is_set():
                    break
                if len(idxs) < batch_size:
                    if drop_last:
                        continue
                    idxs = np.concatenate(
                        [idxs, np.repeat(idxs[:1], batch_size - len(idxs))]
                    )
                if local_slice is not None:
                    idxs = idxs[local_slice]
                if not try_put(host_batch(list(pool.map(dataset.fetch, idxs)))):
                    return
        finally:
            try:
                q.put(None, block=False)
            except queue.Full:
                pass  # consumer is gone; nothing waits for the sentinel

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    try:
        while True:
            try:
                item = q.get(timeout=1.0)
            except queue.Empty:
                if not thread.is_alive():
                    break  # producer died without a sentinel
                continue
            if item is None:
                break
            yield item
    finally:
        stop.set()
        pool.shutdown(wait=False)
