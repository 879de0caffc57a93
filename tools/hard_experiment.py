"""Hard-benchmark experiment (VERDICT r3 next#5): train a conditioned
Segment on the OCHuman-analog hard set (data/synthetic.make_hard_dataset:
3-6 overlapping instances/image, >=4x scale range, occluded + missing
keypoints) and report held-out FULL-IMAGE mask AP conditioned vs
unconditioned — the same identical-weights protocol as
examples/crossed_fullimage_eval.json, at a difficulty the toy sets
never reached.

Writes ``--out`` (default examples/hard_fullimage_eval.json) with both
eval dicts + the training protocol.  Backend: the attached TPU by
default; --cpu forces the CPU fallback (slower, smaller defaults
advised: --out-size 192 --epochs 12).

Usage:
  python tools/hard_experiment.py --train-images 100 --val-images 40 \
      --out-size 480 --epochs 30 --batch 16
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default=os.path.join(REPO, "examples",
                                                 "hard_fullimage_eval.json"))
    p.add_argument("--workdir", default=None)
    p.add_argument("--train-images", type=int, default=100)
    p.add_argument("--val-images", type=int, default=40)
    p.add_argument("--image-h", type=int, default=480)
    p.add_argument("--image-w", type=int, default=640)
    p.add_argument("--out-size", type=int, default=480)
    p.add_argument("--canvas", type=int, default=640)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--val-iter", type=int, default=10_000)
    p.add_argument("--max-val-batches", type=int, default=2)
    p.add_argument("--max-images", type=int, default=0,
                   help="cap eval images (0 = all)")
    p.add_argument("--flip-prob", type=float, default=0.5)
    p.add_argument("--rotate", type=float, default=0.0)
    p.add_argument("--rotate-impl", default="2pass",
                   help="rotated sampler: 2pass | 2level | gather "
                        "(AugmentConfig.rotate_impl)")
    p.add_argument("--seed", type=int, default=0,
                   help="train seed (trajectory-variance checks)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--float32", action="store_true")
    p.add_argument("--checkpoint", default=None,
                   help="skip training, evaluate this checkpoint")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from instancesegmentation_tpu.data.synthetic import make_hard_dataset

    workdir = args.workdir or tempfile.mkdtemp(prefix="hard_")
    train_dir = os.path.join(workdir, "train")
    val_dir = os.path.join(workdir, "val")
    if not os.path.isdir(os.path.join(train_dir, "data")):
        make_hard_dataset(train_dir, num_images=args.train_images, seed=11,
                          image_hw=(args.image_h, args.image_w))
    if not os.path.isdir(os.path.join(val_dir, "data")):
        make_hard_dataset(val_dir, num_images=args.val_images, seed=97,
                          image_hw=(args.image_h, args.image_w))
    print(f"hard set at {workdir}", flush=True)

    ckpt = args.checkpoint
    train_seconds = None
    if ckpt is None:
        from instancesegmentation_tpu.train.loop import main as train_main

        t0 = time.time()
        train_main([
            "--train-dataset-dir", train_dir,
            "--val-dataset-dir", val_dir,
            "--checkpoint-dir", os.path.join(workdir, "ckpt"),
            "--out-dir", os.path.join(workdir, "runs"),
            "--canvas", str(args.canvas),
            "--out-size", str(args.out_size),
            "--batch-size", str(args.batch),
            "--epochs", str(args.epochs),
            "--val-iter", str(args.val_iter),
            "--max-val-batches", str(args.max_val_batches),
            "--save-iou-gate", "0.0",
            "--bfloat16", "false" if args.float32 else "true",
            "--flip-prob", str(args.flip_prob),
            "--rotate", str(args.rotate),
            "--rotate-impl", args.rotate_impl,
            "--seed", str(args.seed),
            "--in-channels", "20",
        ])
        train_seconds = round(time.time() - t0, 1)
        ckpt = os.path.join(workdir, "ckpt", "main_best.ckpt")
    assert os.path.exists(ckpt), ckpt

    from instancesegmentation_tpu.eval import evaluate_full_image

    common = dict(
        checkpoint=ckpt, size=args.out_size, in_channels=20,
        bfloat16=not args.float32, max_images=args.max_images,
        canvas=args.canvas,
    )
    cond = evaluate_full_image(val_dir, use_keypoints=True, **common)
    print("conditioned  :", json.dumps(cond), flush=True)
    uncond = evaluate_full_image(val_dir, use_keypoints=False, **common)
    print("unconditioned:", json.dumps(uncond), flush=True)

    result = {
        "conditioned": cond,
        "unconditioned": uncond,
        "protocol": {
            "generator": "data/synthetic.make_hard_dataset (OCHuman-analog:"
                         " 3-6 overlapping instances, visible/modal masks,"
                         " >=4x scale range, occluded 'not_vis' + missing"
                         " keypoints, near-ambiguous palette)",
            "train_images": args.train_images,
            "val_images": args.val_images,
            "image_hw": [args.image_h, args.image_w],
            "crop": args.out_size,
            "canvas": args.canvas,
            "epochs": args.epochs,
            "batch": args.batch,
            "flip_prob": args.flip_prob,
            "rotate": args.rotate,
            "rotate_impl": args.rotate_impl,
            "seed": args.seed,
            "train_seconds": train_seconds,
            "checkpoint": ckpt,
            "backend": jax.default_backend(),
            "eval": "eval.evaluate_full_image on the held-out val split: "
                    "GT boxes + GT keypoints through the fused proposal "
                    "pipeline; unconditioned = IDENTICAL weights, zero "
                    "heatmaps (use_keypoints=False)",
        },
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print("wrote", args.out)
    print(json.dumps({
        "conditioned_AP": cond["AP"], "unconditioned_AP": uncond["AP"],
        "delta": round(cond["AP"] - uncond["AP"], 6),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
