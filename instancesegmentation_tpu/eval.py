"""Dataset evaluation CLI: mean mask IoU + COCO-style mask AP.

Implements BASELINE.json config 3 ("OCHuman occluded-person eval via
transfer_ochuman -> common JSON -> TPU inference, mask AP parity
check"): run instance-mode inference over a common-format dataset and
score predictions against the GT instance masks.

Usage:
  python -m instancesegmentation_tpu.eval --dataset DIR \
      [--checkpoint X.ckpt|X.pth] [--size 480] [--batch 8] \
      [--in-channels 20] [--max-batches N] [--float32]

Prints one JSON line: {"mean_iou", "AP", "AP50", "AP75", "num_instances"}.
"""
from __future__ import annotations

import argparse
import json

import numpy as np


def evaluate_dataset(
    dataset_dir: str,
    checkpoint: str | None = None,
    size: int = 480,
    batch_size: int = 8,
    in_channels: int = 20,
    max_batches: int = 0,
    bfloat16: bool = True,
) -> dict:
    import jax
    import jax.numpy as jnp

    from instancesegmentation_tpu.core.evaluation import mask_ap, mean_mask_iou
    from instancesegmentation_tpu.data.dataset import InstanceCommonDataset
    from instancesegmentation_tpu.data.pipeline import batch_iterator
    from instancesegmentation_tpu.infer.pipeline import (
        InferenceEngine,
        load_any_checkpoint,
    )
    from instancesegmentation_tpu.models.segment import Segment

    dtype = jnp.bfloat16 if bfloat16 else jnp.float32
    model = Segment(in_channels=in_channels, dtype=dtype)
    init_args = [jnp.zeros((1, size, size, 3))]
    if in_channels > 3:
        init_args.append(jnp.zeros((1, size, size, in_channels - 3)))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), *init_args, train=False
    )
    if checkpoint:
        variables = load_any_checkpoint(checkpoint, variables)

    engine = InferenceEngine(variables, in_channels=in_channels, size=size, dtype=dtype)
    ds = InstanceCommonDataset(dataset_dir)

    # per-instance evaluation in the crop frame: prediction vs the GT
    # mask warped by the same transform (the reference's val protocol,
    # train_instance.py:398-417, extended with AP)
    from instancesegmentation_tpu.data.pipeline import AugmentConfig, preprocess_batch

    aug = AugmentConfig(out_size=(size, size))
    pred_masks: list[np.ndarray] = []
    gt_masks: list[np.ndarray] = []
    for k, batch in enumerate(
        batch_iterator(ds, batch_size, shuffle=False, epochs=1, drop_last=False)
    ):
        probs, _ = engine.predict_instances(batch)
        _, _, masks = preprocess_batch(batch, jax.random.PRNGKey(0), aug)
        masks = np.asarray(masks)
        for i in range(probs.shape[0]):
            pred_masks.append((probs[i, ..., 0] > 0.5).astype(np.uint8) * 255)
            gt_masks.append((masks[i, ..., 0] > 0.5).astype(np.uint8) * 255)
        if max_batches and k + 1 >= max_batches:
            break

    n = min(len(pred_masks), len(ds))  # drop tail padding
    pred_masks, gt_masks = pred_masks[:n], gt_masks[:n]

    miou = mean_mask_iou(pred_masks, gt_masks)
    # AP treats each crop as one image with one GT instance; scores are
    # the mean foreground probability (confidence proxy)
    preds = [
        {"masks": [p], "scores": [float((p > 0).mean()) + 0.5]}
        for p in pred_masks
    ]
    ap = mask_ap(preds, [[g] for g in gt_masks])
    return {
        "mean_iou": round(float(miou), 6),
        "AP": round(ap["AP"], 6),
        "AP50": round(ap["AP50"], 6),
        "AP75": round(ap["AP75"], 6),
        "num_instances": n,
    }


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="evaluate on a common-format dataset")
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--size", type=int, default=480)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--in-channels", type=int, default=20)
    parser.add_argument("--max-batches", type=int, default=0)
    parser.add_argument("--float32", action="store_true")
    args = parser.parse_args(argv)
    result = evaluate_dataset(
        args.dataset, args.checkpoint, args.size, args.batch,
        args.in_channels, args.max_batches, bfloat16=not args.float32,
    )
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
