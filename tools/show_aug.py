"""Dataset / augmentation visual QA tool.

Offline replacement for reference tool/show_aug.py (SURVEY.md §2.1 #18):
instead of cv.imshow windows it writes PNG grids, so it works headless.

Modes:
  show-dataset  per annotation: image | overlay (keypoints+masks) | union mask
                (reference show_dataset, show_aug.py:127-172)
  show-aug      per eligible object: replay the EXACT training
                preprocessing (fused warp + heatmaps, the compiled
                graph's own ops) and render image | overlay | mask |
                heatmap-sum (reference test1, show_aug.py:17-124)

Usage:
  python tools/show_aug.py show-dataset <dataset_dir> <out_dir> [--limit N]
  python tools/show_aug.py show-aug <dataset_dir> <out_dir> [--limit N]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from instancesegmentation_tpu.core.keys import key_combine  # noqa: E402
from instancesegmentation_tpu.core.records import (  # noqa: E402
    common_ann_loader,
    common_transfer,
)
from instancesegmentation_tpu.core.visualize import (  # noqa: E402
    draw_box,
    draw_keypoint,
    draw_label,
    draw_mask,
    image_grid,
)


def show_dataset(dataset_dir: str, out_dir: str, limit: int = 16) -> int:
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for ann in common_ann_loader(dataset_dir):
        if n >= limit:
            break
        common_transfer(ann)
        image = ann[key_combine("image", "image")]
        mask = ann.get(key_combine("segment_mask", "mask"))
        mix = image.copy()
        for obj in ann.get(key_combine("object", "sub_list"), []):
            if key_combine("body_keypoint", "sub_dict") in obj:
                draw_keypoint(mix, obj[key_combine("body_keypoint", "sub_dict")], labeled=True)
            if key_combine("instance_mask", "mask") in obj:
                draw_mask(mix, obj[key_combine("instance_mask", "mask")])
            if key_combine("box", "box_xyxy") in obj:
                draw_box(mix, obj[key_combine("box", "box_xyxy")])
        panels = [image, mix]
        if mask is not None:
            panels.append(np.repeat(mask[..., None], 3, axis=-1))
        grid = image_grid([panels])
        cv2.imwrite(
            os.path.join(out_dir, f"dataset_{n:04d}.png"),
            cv2.cvtColor(grid, cv2.COLOR_RGB2BGR),
        )
        n += 1
    return n


def show_aug(dataset_dir: str, out_dir: str, limit: int = 16, out_size: int = 480,
             flip_prob: float = 0.0, jitter: float = 0.0,
             rotate: float = 0.0, seed: int = 0) -> int:
    """Replay the training preprocess (the real compiled ops) per object."""
    import cv2
    import jax

    from instancesegmentation_tpu.data.dataset import InstanceCommonDataset
    from instancesegmentation_tpu.data.pipeline import (
        AugmentConfig,
        host_batch,
        preprocess_batch,
    )

    os.makedirs(out_dir, exist_ok=True)
    ds = InstanceCommonDataset(dataset_dir)
    cfg = AugmentConfig(out_size=(out_size, out_size), flip_prob=flip_prob,
                        jitter=jitter, rotate=rotate,
                        rotate_prob=1.0 if rotate else 0.6)
    n = 0
    for i in range(min(limit, len(ds))):
        batch = host_batch([ds.fetch(i)])
        images, heatmaps, masks = preprocess_batch(
            batch, jax.random.PRNGKey(seed + i), cfg
        )
        img = ((np.asarray(images[0]) + 1) * 127.5).clip(0, 255).astype(np.uint8)
        mask = (np.asarray(masks[0, ..., 0]) * 255).astype(np.uint8)
        hm = (np.asarray(heatmaps[0]).max(axis=-1) * 255).astype(np.uint8)
        mix = img.copy()
        draw_mask(mix, mask)
        draw_label(mix, "person", (4, 4))
        grid = image_grid(
            [[img, mix,
              np.repeat(mask[..., None], 3, -1),
              np.repeat(hm[..., None], 3, -1)]]
        )
        cv2.imwrite(
            os.path.join(out_dir, f"aug_{i:04d}.png"),
            cv2.cvtColor(grid, cv2.COLOR_RGB2BGR),
        )
        n += 1
    return n


def main(argv=None):
    # visual QA never needs an accelerator; forcing CPU avoids minutes
    # of remote-TPU compile latency for throwaway shapes (env vars are
    # not enough here — the container pins JAX_PLATFORMS at startup)
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("mode", choices=["show-dataset", "show-aug"])
    parser.add_argument("dataset_dir")
    parser.add_argument("out_dir")
    parser.add_argument("--limit", type=int, default=16)
    parser.add_argument("--out-size", type=int, default=480)
    parser.add_argument("--flip-prob", type=float, default=0.0)
    parser.add_argument("--jitter", type=float, default=0.0)
    parser.add_argument("--rotate", type=float, default=0.0,
                        help="max +-degrees; applied to every sample "
                             "(QA mode) when set")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)
    if args.mode == "show-dataset":
        n = show_dataset(args.dataset_dir, args.out_dir, args.limit)
    else:
        n = show_aug(args.dataset_dir, args.out_dir, args.limit,
                     args.out_size, flip_prob=args.flip_prob,
                     jitter=args.jitter, rotate=args.rotate,
                     seed=args.seed)
    print(f"wrote {n} grids to {args.out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
