"""Inference CLI, flag-compatible with the reference stub.

Reference contract (reference infer.py:12-21): ``-i/--test-image-dir``,
``-o/--output-dir``, ``--continue-test`` (skip existing outputs).  The
reference's broken character-class glob (``"*[jpg,png,jpgerr]"``, bug
SURVEY.md §2.3.3) becomes a real extension filter.

Extra flags: ``--checkpoint`` (.ckpt or torch .pth), ``--dataset-mode``
to run instance-mode over a common-format directory, ``--size``,
``--batch``, ``--threshold``, ``--in-channels``.
"""
from __future__ import annotations

import argparse
import glob
import os

import numpy as np

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="inference image")
    parser.add_argument("-i", "--test-image-dir", required=True,
                        help="image test dir (or common-format dataset dir)")
    parser.add_argument("-o", "--output-dir", required=True, help="mask save dir")
    parser.add_argument("--continue-test", action="store_true",
                        help="skip existing files")
    parser.add_argument("--checkpoint", default=None,
                        help=".ckpt (this framework) or .pth (torch reference)")
    parser.add_argument("--dataset-mode", action="store_true",
                        help="treat input as a common-format dataset; "
                             "per-instance crops + keypoint conditioning")
    parser.add_argument("--proposals", default=None,
                        help="JSON file {image_name: {boxes: [[xyxy]...], "
                             "scores: [...]}}: proposal-based multi-instance "
                             "mode (device NMS + per-proposal segmentation)")
    parser.add_argument("--nms-threshold", type=float, default=0.7)
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--threshold", type=float, default=0.5)
    parser.add_argument("--in-channels", type=int, default=None,
                        help="3 or 20; default 20 in dataset mode else 3")
    parser.add_argument("--float32", action="store_true",
                        help="disable bfloat16 compute")
    parser.add_argument("--int8", action="store_true",
                        help="int8 PTQ serving: calibrate on the first "
                             "--int8-calib-batches of the actual input "
                             "source, then run the spatial backbone convs "
                             "s8xs8->s32 (models/quantize.py, selective "
                             "int8_mxu mode).  Measured ~9%% SLOWER than "
                             "bf16 on this memory-bound net (ROOFLINE.md "
                             "r4) — a compat/accuracy knob, not a speed "
                             "knob")
    parser.add_argument("--int8-calib-batches", type=int, default=2)
    parser.add_argument("--fused-stem", action="store_true",
                        help="conditioned (20-ch) checkpoints: fold the "
                             "heatmap conditioning through the stem as "
                             "keypoint patches instead of rendering the "
                             "dense 17-ch stack (models/fused_stem_hm.py). "
                             "Measured ~3x slower than the dense render "
                             "(ROOFLINE.md r4); kept for experimentation")
    return parser.parse_args(argv)


def list_images(directory: str) -> list[str]:
    paths = []
    for p in sorted(glob.glob(os.path.join(directory, "*"))):
        if os.path.splitext(p)[1].lower() in IMAGE_EXTS:
            paths.append(p)
    return paths


def main(argv=None) -> int:
    import cv2
    import jax.numpy as jnp

    from instancesegmentation_tpu.infer.pipeline import (
        InferenceEngine,
        load_any_checkpoint,
    )
    from instancesegmentation_tpu.models.segment import Segment

    args = parse_args(argv)
    in_channels = args.in_channels or (20 if args.dataset_mode else 3)
    dtype = jnp.float32 if args.float32 else jnp.bfloat16

    import jax

    model = Segment(in_channels=in_channels, dtype=dtype)
    init_args = [jnp.zeros((1, args.size, args.size, 3))]
    if in_channels > 3:
        init_args.append(jnp.zeros((1, args.size, args.size, in_channels - 3)))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), *init_args, train=False
    )
    if args.checkpoint:
        variables = load_any_checkpoint(args.checkpoint, variables)

    quant = None
    if args.int8:
        from instancesegmentation_tpu.models.quantize import (
            calibrate_on_dataset,
            calibrate_on_images,
        )

        if args.dataset_mode:
            quant = calibrate_on_dataset(
                variables, args.test_image_dir, in_channels=in_channels,
                size=args.size, batches=args.int8_calib_batches,
                batch_size=args.batch,
            )
        else:
            calib_paths = list_images(args.test_image_dir)
            calib_paths = calib_paths[: args.int8_calib_batches * args.batch]
            calib = [
                cv2.cvtColor(
                    cv2.imread(p, cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB
                )
                for p in calib_paths
            ]
            quant = calibrate_on_images(
                variables, calib, in_channels=in_channels, size=args.size
            )
        print(f"int8: calibrated {sum(1 for _ in jax.tree.leaves(quant))} conv scales")

    engine = InferenceEngine(
        variables, in_channels=in_channels, size=args.size,
        dtype=dtype, threshold=args.threshold,
        fused_stem=args.fused_stem, quant=quant,
    )
    os.makedirs(args.output_dir, exist_ok=True)

    if args.dataset_mode:
        from instancesegmentation_tpu.core.keys import key_combine
        from instancesegmentation_tpu.data.dataset import InstanceCommonDataset
        from instancesegmentation_tpu.data.pipeline import batch_iterator

        k_maskrel = key_combine("instance_mask", "mask_path")
        ds = InstanceCommonDataset(args.test_image_dir)
        print(f"{len(ds)} eligible instances")
        # outputs mirror the common format's instance_mask/<image>/<i>.png
        # layout (reference transfer_coco.py:125-137), so predictions
        # stay joinable against data/*.json without re-walking the
        # dataset (VERDICT r2 weak#6: running indices destroyed the
        # image/instance-to-mask correspondence)
        written = 0
        for batch in batch_iterator(
            ds, args.batch, shuffle=False, epochs=1, drop_last=False
        ):
            _, canvas_masks = engine.predict_instances(batch)
            for i in range(canvas_masks.shape[0]):
                if written >= len(ds):
                    break  # tail-batch padding repeats samples; drop it
                rel = ds.records[written][k_maskrel]
                out_path = os.path.join(args.output_dir, rel)
                written += 1
                if args.continue_test and os.path.exists(out_path):
                    continue
                os.makedirs(os.path.dirname(out_path), exist_ok=True)
                h, w = batch["image_hw"][i].astype(int)
                cv2.imwrite(out_path, canvas_masks[i, :h, :w])
        print(f"wrote {written} instance masks to {args.output_dir}")
        return 0

    if args.proposals:
        import json

        from instancesegmentation_tpu.infer.proposals import segment_proposals

        with open(args.proposals) as f:
            proposal_map = json.load(f)
        written = 0
        for path in list_images(args.test_image_dir):
            name = os.path.splitext(os.path.basename(path))[0]
            entry_ = proposal_map.get(name) or proposal_map.get(
                os.path.basename(path)
            )
            if not entry_:
                continue
            img = cv2.cvtColor(cv2.imread(path, cv2.IMREAD_COLOR), cv2.COLOR_BGR2RGB)
            results = segment_proposals(
                engine, img, entry_["boxes"], entry_["scores"],
                nms_threshold=args.nms_threshold,
            )
            for j, r in enumerate(results):
                out_path = os.path.join(args.output_dir, f"{name}_{j}.png")
                if args.continue_test and os.path.exists(out_path):
                    continue
                cv2.imwrite(out_path, r["mask"])
                written += 1
        print(f"wrote {written} proposal masks to {args.output_dir}")
        return 0

    paths = list_images(args.test_image_dir)
    print(f"{len(paths)} images")
    todo = []
    for p in paths:
        name = os.path.splitext(os.path.basename(p))[0] + ".png"
        out_path = os.path.join(args.output_dir, name)
        if args.continue_test and os.path.exists(out_path):
            continue
        todo.append((p, out_path))

    for start in range(0, len(todo), args.batch):
        chunk = todo[start : start + args.batch]
        images = []
        for p, _ in chunk:
            img = cv2.imread(p, cv2.IMREAD_COLOR)
            images.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
        masks = engine.predict_images(images)
        for (_, out_path), mask in zip(chunk, masks):
            cv2.imwrite(out_path, mask)
    print(f"wrote {len(todo)} masks to {args.output_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
