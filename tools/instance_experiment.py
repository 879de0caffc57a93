"""Decompose the fused instance pipeline's ~128 µs/img (bench line 1).

The conditioned per-instance program (crop-warp from the 640px canvas +
17-ch heatmap render + 20-ch conditioned forward + folded head +
sigmoid) runs 7.8k img/s at 480² — i.e. ~128 µs/img, versus ~60 µs for
the whole-image 512² serving program.  Where do the other ~70 µs go?
Candidates: (1) the bilinear crop-warp gathers, (2) rendering 17
Gaussian channels at full 480² resolution (~7.8 MB/img bf16 if
materialized), (3) the 20-channel stem being ~7x the input bytes of the
3-channel one.  This times, with the fori_loop methodology:

  a. full pipeline                 (the bench body)
  b. preprocess only               (warp + photometrics + heatmaps)
  c. warp+photometrics only        (isolates 2 by subtraction)
  d. heatmap render only
  e. conditioned forward only      (pre-computed images/heatmaps)
  f. forward w/o heatmaps          (3-ch model at 480²; isolates 3)

Usage: python tools/instance_experiment.py [--batch 128] [--out 480]
Prints one JSON line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn, *args) -> float:
    float(fn(*args))
    t0 = time.perf_counter()
    checksum = float(fn(*args))
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)
    return dt


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--canvas", type=int, default=640)
    p.add_argument("--out", type=int, default=480)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from instancesegmentation_tpu.data.pipeline import (
        AugmentConfig,
        preprocess_batch,
    )
    from instancesegmentation_tpu.data.synthetic import synthetic_host_batch
    from instancesegmentation_tpu.models.fused_head import fold_head, head_apply
    from instancesegmentation_tpu.models.segment import Segment

    b, canvas, out = args.batch, args.canvas, args.out
    dt16 = jnp.bfloat16
    aug = AugmentConfig(out_size=(out, out), out_dtype=dt16)

    model20 = Segment(in_channels=20, dtype=dt16)
    v20 = jax.jit(model20.init, static_argnames=("train",))(
        jax.random.PRNGKey(0),
        jnp.zeros((1, out, out, 3)),
        jnp.zeros((1, out, out, 17)),
        train=False,
    )
    head20 = fold_head(v20["params"])

    model3 = Segment(in_channels=3, dtype=dt16)
    v3 = jax.jit(model3.init, static_argnames=("train",))(
        jax.random.PRNGKey(1), jnp.zeros((1, out, out, 3)), train=False
    )
    head3 = fold_head(v3["params"])

    batch = {
        k: jax.device_put(jnp.asarray(v))
        for k, v in synthetic_host_batch(b, canvas).items()
    }

    def full(bt):
        images, heatmaps, _ = preprocess_batch(bt, jax.random.PRNGKey(0), aug)
        feats = model20.apply(
            v20, images, heatmaps, train=False, truncate_head=True
        )
        return jax.nn.sigmoid(head_apply(feats, head20, dtype=dt16))

    def preprocess_only(bt):
        images, heatmaps, _ = preprocess_batch(bt, jax.random.PRNGKey(0), aug)
        return images[..., :1] + heatmaps[..., :1]

    def warp_only(bt):
        # heatmap render costs by subtraction: preprocess_only - this
        cfg = AugmentConfig(out_size=(out, out), out_dtype=dt16)
        images, _, masks = preprocess_batch(
            bt, jax.random.PRNGKey(0), cfg
        )
        return images[..., :1] + masks

    def heatmaps_only(bt):
        from instancesegmentation_tpu.ops.heatmap import render_heatmaps

        kps = bt["keypoints"].astype(jnp.float32)
        hm = jax.vmap(
            lambda p, v: render_heatmaps(p, v, (out, out))
        )(kps[..., :2] * (out / canvas), kps[..., 2] > 0.5)
        return hm.astype(dt16)

    def fwd20(images, heatmaps):
        feats = model20.apply(
            v20, images, heatmaps, train=False, truncate_head=True
        )
        return jax.nn.sigmoid(head_apply(feats, head20, dtype=dt16))

    from instancesegmentation_tpu.models.fused_stem_hm import (
        fold_stem_hm,
        stem_hm_apply,
    )

    stem_fold = fold_stem_hm(v20)

    def fwd20_folded(images, pts, vis):
        feats = stem_hm_apply(images, pts, vis, stem_fold, dtype=dt16)
        feats = model20.apply(
            v20, feats, train=False, skip_stem=True, truncate_head=True
        )
        return jax.nn.sigmoid(head_apply(feats, head20, dtype=dt16))

    def full_folded(bt):
        """Whole instance pipeline with the stem fold: crop-warp +
        patch-rendered conditioning, no dense heatmap stack."""
        from instancesegmentation_tpu.ops.warp import (
            WarpParams,
            center_translation,
            clipped_mask_box,
            instance_warp_params,
            warp_image,
            warp_points,
        )

        obj_box = bt["obj_box"].astype(jnp.float32)
        image_hw = bt["image_hw"].astype(jnp.float32)
        t = jax.vmap(center_translation)(obj_box, image_hw)
        mask_box, mask_valid = jax.vmap(clipped_mask_box)(
            bt["mask"], t, image_hw
        )
        params = jax.vmap(
            lambda ob, mb, hw, mv: instance_warp_params(
                ob, mb, hw, (out, out), 16, mv
            )
        )(obj_box, mask_box, image_hw, mask_valid)
        imgs = jax.vmap(
            lambda im, s, o: warp_image(
                im.astype(jnp.float32), WarpParams(s, o), (out, out)
            )
        )(bt["image"], params.scale, params.offset)
        x = (jnp.clip(imgs, 0.0, 255.0) / 127.5 - 1.0).astype(dt16)
        kps = bt["keypoints"].astype(jnp.float32)
        pts = jax.vmap(
            lambda p, s, o: warp_points(p, WarpParams(s, o))
        )(kps[..., :2], params.scale, params.offset)
        vis = kps[..., 2] > 0.5
        return fwd20_folded(x, pts, vis)

    def fwd3(images):
        feats = model3.apply(v3, images, train=False, truncate_head=True)
        return jax.nn.sigmoid(head_apply(feats, head3, dtype=dt16))

    rng = np.random.default_rng(0)

    def loop_batch(body):
        """fori_loop over bodies consuming the canvas batch dict."""

        @jax.jit
        def run(bt):
            def step(i, carry):
                acc, img = carry
                outv = body(dict(bt, image=img))
                acc = acc + jnp.sum(outv[:1, :1].astype(jnp.float32))
                bump = (acc > jnp.float32(1e30)).astype(img.dtype)
                return acc, img.at[0, 0, 0, 0].add(bump)

            return jax.lax.fori_loop(
                0, args.iters, step, (jnp.zeros((), jnp.float32), bt["image"])
            )[0]

        return run

    def loop_inputs(body, *xs):
        @jax.jit
        def run(*xs):
            x0 = xs[0]

            def step(i, carry):
                acc, x = carry
                outv = body(x, *xs[1:])
                acc = acc + jnp.sum(outv[:1, :1].astype(jnp.float32))
                bump = (acc > jnp.float32(1e30)).astype(x.dtype)
                return acc, x.at[0, 0, 0, 0].add(bump)

            return jax.lax.fori_loop(
                0, args.iters, step, (jnp.zeros((), jnp.float32), x0)
            )[0]

        return run

    images0 = jax.device_put(
        jnp.asarray(
            rng.normal(size=(b, out, out, 3)).astype(np.float32), dt16
        )
    )
    hm0 = jax.device_put(
        jnp.asarray(
            rng.uniform(size=(b, out, out, 17)).astype(np.float32), dt16
        )
    )

    kps0 = batch["keypoints"].astype(jnp.float32)
    pts0 = kps0[..., :2] * (out / canvas)
    vis0 = kps0[..., 2] > 0.5

    n = b * args.iters
    res = {"batch": b, "out": out, "canvas": canvas}
    for name, timed in [
        ("full", lambda: _timed(loop_batch(full), batch)),
        ("full_folded", lambda: _timed(loop_batch(full_folded), batch)),
        ("preprocess", lambda: _timed(loop_batch(preprocess_only), batch)),
        ("warp", lambda: _timed(loop_batch(warp_only), batch)),
        ("heatmaps", lambda: _timed(loop_batch(heatmaps_only), batch)),
        ("fwd20", lambda: _timed(loop_inputs(fwd20, images0, hm0), images0, hm0)),
        ("fwd20_folded", lambda: _timed(
            loop_inputs(fwd20_folded, images0, pts0, vis0),
            images0, pts0, vis0,
        )),
        ("fwd3", lambda: _timed(loop_inputs(fwd3, images0), images0)),
    ]:
        res[f"{name}_us_per_img"] = round(timed() / n * 1e6, 2)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
