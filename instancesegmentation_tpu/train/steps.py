"""Jitted train/eval steps with the input program fused in.

Each step takes the HOST batch (canvas uint8 + geometry) and performs
preprocess -> forward -> loss -> backward -> update as ONE XLA program
(donated state, no host round-trips) — the reference's per-worker imgaug
plus torch loop (reference train_instance.py:371-380) collapsed into a
single compiled step.  Loss is sigmoid-BCE-with-logits (numerically
stable equivalent of the reference's BCELoss-on-sigmoid, ref :299,:378).
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from instancesegmentation_tpu.data.pipeline import AugmentConfig, preprocess_batch
from instancesegmentation_tpu.train.state import TrainState


def augment_config(cfg, train: bool) -> AugmentConfig:
    return AugmentConfig(
        out_size=cfg.out_hw,
        flip_prob=cfg.flip_prob if train else 0.0,
        jitter=cfg.jitter if train else 0.0,
        rotate=cfg.rotate if train else 0.0,
        rotate_prob=cfg.rotate_prob,
        rotate_chunk=getattr(cfg, "rotate_chunk", 0),
        rotate_impl=getattr(cfg, "rotate_impl", "2level"),
        rotate_block=getattr(cfg, "rotate_block", 16),
        brightness=cfg.brightness if train else 0.0,
        contrast=cfg.contrast if train else 0.0,
        noise_std=cfg.noise_std if train else 0.0,
        # emit model inputs in the compute dtype: the first conv would
        # cast anyway, this just halves the HBM width of the pipeline's
        # largest tensors (the [oh,ow,17] heatmaps)
        out_dtype=jnp.bfloat16 if cfg.bfloat16 else None,
    )


def bce_loss(logits: jax.Array, targets: jax.Array) -> jax.Array:
    return optax.sigmoid_binary_cross_entropy(logits, targets).mean()


def per_sample_mask_iou(probs: jax.Array, targets: jax.Array) -> jax.Array:
    """Per-sample mask IoU [B] in jnp (binarize at 0.5, empty-vs-empty
    counts as 1.0) — device-side replacement for the reference's
    CPU-numpy mask_iou loop (ref :398-417).  Returning the vector (not
    the batch mean) lets the validator drop padded tail samples."""
    pred = probs > 0.5
    true = targets > 0.5
    inter = jnp.sum(pred & true, axis=(1, 2, 3))
    union = jnp.sum(pred | true, axis=(1, 2, 3))
    return jnp.where(union > 0, inter / jnp.maximum(union, 1), 1.0)


def batch_mask_iou(probs: jax.Array, targets: jax.Array) -> jax.Array:
    """Batch-mean mask IoU (see per_sample_mask_iou)."""
    return per_sample_mask_iou(probs, targets).mean()


def _forward_inputs(cfg, images, heatmaps):
    if cfg.use_heatmaps:
        return (images, heatmaps)
    return (images, None)


def make_fwd(model, cfg, batch_stats, train: bool):
    """Build the params -> (f32 logits, updates) forward.

    With ``cfg.fused_head`` the section-6 head runs in its folded form
    (models/fused_head.py), re-derived from the live params every call:
    ``fold_head`` is plain differentiable jax, so gradients reach the
    original bottle6_* params and the checkpoint layout is unchanged.
    The head has no BN/activation (models/segment.py:122-124), so the
    fold is valid in train mode; bf16 reduction order differs slightly
    from the unfused pair (f32 training is exact).
    """
    use_fused = getattr(cfg, "fused_head", False)
    if use_fused:
        from instancesegmentation_tpu.models.fused_head import (
            fold_head,
            head_apply,
        )

    def fwd(params, *inputs):
        variables = {"params": params, "batch_stats": batch_stats}
        if not use_fused:
            if not train:
                return model.apply(variables, *inputs, train=False), None
            return model.apply(
                variables, *inputs, train=True, mutable=["batch_stats"]
            )
        if train:
            feats, updates = model.apply(
                variables, *inputs, train=True, truncate_head=True,
                mutable=["batch_stats"],
            )
        else:
            feats = model.apply(
                variables, *inputs, train=False, truncate_head=True
            )
            updates = None
        head = fold_head(params)
        logits = head_apply(feats, head, dtype=model.dtype).astype(
            jnp.float32
        )
        return logits, updates

    return fwd


def make_train_step(model, tx, cfg) -> Callable:
    """Build the single-device jitted train step.

    step(state, batch, rng) -> (state, metrics dict)
    """
    aug = augment_config(cfg, train=True)

    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        images, heatmaps, masks = preprocess_batch(batch, rng, aug)
        inputs = _forward_inputs(cfg, images, heatmaps)

        fwd = make_fwd(model, cfg, state.batch_stats, train=True)

        if getattr(cfg, "remat", False):
            fwd = jax.checkpoint(fwd)

        def loss_fn(params):
            logits, updates = fwd(params, *inputs)
            return bce_loss(logits, masks), (logits, updates["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        iou = batch_mask_iou(jax.nn.sigmoid(logits), masks)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
        )
        return new_state, {"loss": loss, "train_iou": iou}

    return train_step


def make_eval_step(model, cfg) -> Callable:
    """Build the jitted eval step.

    eval_step(variables, batch) ->
        (images [B,H,W,3] in [-1,1], probs [B,H,W,1], masks, ious [B])

    The preprocessed images come back so the trainer's viz grid does not
    re-run the preprocess program; IoUs are per-sample so padded tail
    batches can be deduplicated by the caller.
    """
    aug = augment_config(cfg, train=False)

    @jax.jit
    def eval_step(variables: dict, batch: dict):
        images, heatmaps, masks = preprocess_batch(
            batch, jax.random.PRNGKey(0), aug
        )
        inputs = _forward_inputs(cfg, images, heatmaps)
        fwd = make_fwd(model, cfg, variables.get("batch_stats"), train=False)
        logits, _ = fwd(variables["params"], *inputs)
        probs = jax.nn.sigmoid(logits)
        return images, probs, masks, per_sample_mask_iou(probs, masks)

    return eval_step
