"""Quality-parity experiment: train the (repaired) torch reference and
this framework on IDENTICAL data and compare final val IoU.

This is the proof VERDICT r1 called for ("next round #1"): round 1 only
showed forward parity with copied weights; this experiment establishes
that the frameworks *learn* equally well under the reference's own
training protocol.

Protocol (both sides identical):
  - data: synthetic common-format dataset -> preprocessed ONCE with this
    framework's deterministic eval-mode pipeline (fused warp + heatmaps,
    aug off) into fixed crop tensors, so both trainings consume
    bit-identical inputs in the same batch order.
  - model: 20-channel keypoint-conditioned Segment (flagship mode).
    The torch side imports the read-only reference model as an ORACLE
    (no code copied) and repairs its train_batch arity bug
    (reference model/segment.py:531 takes (x, heatmaps) but the loop at
    train_instance.py:377 passes one tensor; SURVEY.md §2.3.1) by
    calling forward on the concatenated input directly.
  - optimization: Adam lr=1e-3 (torch defaults, reference
    train_instance.py:297) + BCE on sigmoid (ref :299,:378; the jax side
    uses the numerically equivalent sigmoid-BCE-with-logits).
  - eval: mean mask IoU at threshold 0.5 over a held-out synthetic val
    set (the reference's val protocol, train_instance.py:398-417).

Run (CPU, a few minutes):
  python tools/parity_experiment.py --out PARITY_r02.json
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
sys.path.insert(0, REPO)


def _prepare_crops(data_dir: str, n_images: int, seed: int, out_size: int,
                   canvas: int = 192, image_hw: tuple = (240, 320),
                   hard: bool = False):
    """Synthetic common-format dataset -> deterministic crop tensors.

    ``hard``: generate the OCHuman-analog crowded/occluded set
    (data/synthetic.make_hard_dataset — 3-6 overlapping instances,
    >=4x scale range, occluded/missing keypoints) instead of the
    single-ellipse toy worlds."""
    import jax

    from instancesegmentation_tpu.data.dataset import InstanceCommonDataset
    from instancesegmentation_tpu.data.pipeline import (
        AugmentConfig,
        host_batch,
        preprocess_batch,
    )
    from instancesegmentation_tpu.data.synthetic import (
        make_hard_dataset,
        make_synthetic_dataset,
    )

    if hard:
        make_hard_dataset(data_dir, num_images=n_images, seed=seed,
                          image_hw=image_hw)
    else:
        make_synthetic_dataset(data_dir, num_images=n_images,
                               objects_per_image=1, seed=seed,
                               image_hw=image_hw)
    ds = InstanceCommonDataset(data_dir, canvas=canvas)
    batch = host_batch([ds.fetch(i) for i in range(len(ds))])
    aug = AugmentConfig(out_size=(out_size, out_size))
    images, heatmaps, masks = preprocess_batch(batch, jax.random.PRNGKey(0), aug)
    return (
        np.asarray(images, np.float32),
        np.asarray(heatmaps, np.float32),
        np.asarray(masks, np.float32),
    )


def _iou(pred: np.ndarray, true: np.ndarray) -> float:
    """Mean per-sample mask IoU (empty-vs-empty = 1), matching
    train.steps.per_sample_mask_iou and the reference's mask_iou loop."""
    p = pred > 0.5
    t = true > 0.5
    inter = np.logical_and(p, t).sum(axis=(1, 2, 3))
    union = np.logical_or(p, t).sum(axis=(1, 2, 3))
    return float(np.where(union > 0, inter / np.maximum(union, 1), 1.0).mean())


def _batch_order(n: int, batch: int, epochs: int, seed: int) -> list[np.ndarray]:
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(epochs):
        order = rng.permutation(n)
        out.extend(order[i:i + batch] for i in range(0, n - batch + 1, batch))
    return out


def train_torch(train, val, batches, lr: float) -> dict:
    """Train the repaired reference model; returns final metrics."""
    import torch

    sys.path.insert(0, REFERENCE)
    from model.segment import Segment as TorchSegment

    ximg, xhm, xmask = train
    vimg, vhm, vmask = val
    # NHWC float crops -> the reference's NCHW 20-channel input
    xin = np.concatenate([ximg, xhm], axis=-1).transpose(0, 3, 1, 2)
    vin = np.concatenate([vimg, vhm], axis=-1).transpose(0, 3, 1, 2)
    xm = xmask.transpose(0, 3, 1, 2)

    torch.manual_seed(0)
    model = TorchSegment(xin.shape[1])
    opt = torch.optim.Adam(model.parameters(), lr=lr)
    bce = torch.nn.BCELoss()

    t0 = time.time()
    model.train()
    losses = []
    for idx in batches:
        xb = torch.from_numpy(xin[idx])
        mb = torch.from_numpy(xm[idx])
        opt.zero_grad()
        # repaired train_batch semantics: sigmoid(forward(cat(x, hm)))
        probs = torch.sigmoid(model(xb))
        loss = bce(probs, mb)
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    model.eval()
    with torch.no_grad():
        vprobs = torch.sigmoid(model(torch.from_numpy(vin))).numpy()
    return {
        "val_iou": _iou(vprobs.transpose(0, 2, 3, 1), vmask),
        "final_loss": float(np.mean(losses[-10:])),
        "first_loss": float(np.mean(losses[:10])),
        "seconds": round(time.time() - t0, 1),
    }


def train_jax(train, val, batches, lr: float) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from instancesegmentation_tpu.models.segment import Segment
    from instancesegmentation_tpu.train.state import TrainState

    ximg, xhm, xmask = train
    vimg, vhm, vmask = val
    size = ximg.shape[1]

    model = Segment(in_channels=3 + xhm.shape[-1], dtype=jnp.float32)
    tx = optax.adam(lr)
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, size, size, 3)),
        jnp.zeros((1, size, size, xhm.shape[-1])),
    )
    state = TrainState.create(variables, tx)

    from functools import partial

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, xb, hb, mb):
        def loss_fn(params):
            logits, upd = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                xb, hb, train=True, mutable=["batch_stats"],
            )
            return (
                optax.sigmoid_binary_cross_entropy(logits, mb).mean(),
                upd["batch_stats"],
            )

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            state.replace(step=state.step + 1, params=params,
                          batch_stats=new_stats, opt_state=opt_state),
            loss,
        )

    t0 = time.time()
    losses = []
    for idx in batches:
        state, loss = step(
            state, jnp.asarray(ximg[idx]), jnp.asarray(xhm[idx]),
            jnp.asarray(xmask[idx]),
        )
        losses.append(float(loss))
    vprobs = np.asarray(
        jax.nn.sigmoid(
            model.apply(state.variables, jnp.asarray(vimg), jnp.asarray(vhm),
                        train=False)
        )
    )
    return {
        "val_iou": _iou(vprobs, vmask),
        "final_loss": float(np.mean(losses[-10:])),
        "first_loss": float(np.mean(losses[:10])),
        "seconds": round(time.time() - t0, 1),
    }


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--out", default="PARITY_r02.json")
    parser.add_argument("--train-images", type=int, default=24)
    parser.add_argument("--val-images", type=int, default=8)
    parser.add_argument("--out-size", type=int, default=64)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--epochs", type=int, default=60)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--workdir", default=None)
    parser.add_argument("--canvas", type=int, default=192,
                        help="host canvas side (use 640 for the 480px "
                             "reference operating point)")
    parser.add_argument("--image-h", type=int, default=240)
    parser.add_argument("--image-w", type=int, default=320,
                        help="synthetic source image size; scale up with "
                             "--out-size so crop upsampling factors match "
                             "the reference's COCO regime")
    parser.add_argument("--hard", action="store_true",
                        help="train/val on the OCHuman-analog hard set "
                             "(crowded, occluded, scale-varied; "
                             "data/synthetic.make_hard_dataset)")
    args = parser.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")  # fair CPU-vs-CPU protocol

    import tempfile

    workdir = args.workdir or tempfile.mkdtemp(prefix="parity_")
    train = _prepare_crops(
        os.path.join(workdir, "train"), args.train_images, seed=11,
        out_size=args.out_size, canvas=args.canvas,
        image_hw=(args.image_h, args.image_w), hard=args.hard,
    )
    val = _prepare_crops(
        os.path.join(workdir, "val"), args.val_images, seed=97,
        out_size=args.out_size, canvas=args.canvas,
        image_hw=(args.image_h, args.image_w), hard=args.hard,
    )
    batches = _batch_order(train[0].shape[0], args.batch, args.epochs, seed=3)
    print(f"{train[0].shape[0]} train / {val[0].shape[0]} val crops, "
          f"{len(batches)} steps @ batch {args.batch}")

    jax_m = train_jax(train, val, batches, args.lr)
    print(f"jax   : {jax_m}")
    torch_m = train_torch(train, val, batches, args.lr)
    print(f"torch : {torch_m}")

    result = {
        "protocol": {
            "model": "Segment in_channels=20 (keypoint-conditioned)",
            "data": ("identical preprocessed HARD-set crops (crowded/"
                     "occluded OCHuman-analog, make_hard_dataset), "
                     if args.hard else
                     "identical preprocessed synthetic crops, ")
                    + "identical batch order (framework eval-mode "
                      "pipeline, aug off)",
            "hard": bool(args.hard),
            "optimizer": f"Adam lr={args.lr}, BCE (ref train_instance.py:297,299)",
            "steps": len(batches),
            "batch": args.batch,
            "crop": args.out_size,
            "canvas": args.canvas,
            "source_image_hw": [args.image_h, args.image_w],
            "train_crops": int(train[0].shape[0]),
            "val_crops": int(val[0].shape[0]),
            "reference_repair": "train_batch arity bug (SURVEY.md §2.3.1): "
                                "sigmoid(forward(cat(image, heatmaps)))",
        },
        "torch_reference_val_iou": round(torch_m["val_iou"], 6),
        "jax_framework_val_iou": round(jax_m["val_iou"], 6),
        "delta_val_iou": round(jax_m["val_iou"] - torch_m["val_iou"], 6),
        "torch": torch_m,
        "jax": jax_m,
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: result[k] for k in
                      ("torch_reference_val_iou", "jax_framework_val_iou",
                       "delta_val_iou")}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
