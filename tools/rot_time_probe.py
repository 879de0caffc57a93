"""Timed decomposition of the rotated train-step slowdown (r4).

ROOFLINE_train_rot.json measured the rotated batch-128 train step at
31 img/s vs 2,161 unrotated (same harness, --iters 5) — a ~70x
pathology, far beyond the 4-tap gather's extra work.  This probe times
each rotated-branch constituent with the bench methodology (chained
fori_loop, single value-forced readback) to locate the time:

  warp128      vmapped warp_image_rotated, 128 x [640,640,3] u8 -> 480^2
  maskwarp128  same on [640,640,1] masks
  maskbox128   vmapped rotated_mask_box (O(canvas^2) reduction)
  pre128       full preprocess_batch with rotate=25 (everything above
               + params + heatmap render + photometric)
  prenorot128  preprocess_batch with rotate=0 (the separable fast path)
  pre128_2level   full preprocess_batch, rotate=25, rotate_impl=2level
                  (blocked hats + banded residual shift; r5)
  pre128_2level_bN  same with rotate_block=N (pass --stages
                  pre128_2level_b8 / _b32 to sweep the block size)
  warp128_2level  the 2level image warp alone (vs warp128's gather)

Writes ROT_TIME_PROBE.json.  Usage: python tools/rot_time_probe.py
[--iters 5 --trials 2 --batch 128]
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CANVAS = 640
OUT = 480


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--trials", type=int, default=2)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--stages", nargs="+", default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from instancesegmentation_tpu.data.pipeline import (
        AugmentConfig,
        preprocess_batch,
    )
    from instancesegmentation_tpu.data.synthetic import synthetic_host_batch
    from instancesegmentation_tpu.ops.warp import (
        RotWarpParams,
        rotated_mask_box,
        warp_image_rotated,
    )

    b = args.batch
    host = synthetic_host_batch(b, CANVAS)
    batch = {k: jax.device_put(jnp.asarray(v)) for k, v in host.items()}
    thetas = jnp.linspace(-0.4, 0.4, b)
    hwf = jnp.asarray([CANVAS, CANVAS], jnp.float32)

    def rot_params(th):
        return RotWarpParams(
            scale=jnp.asarray([CANVAS / OUT, CANVAS / OUT], jnp.float32),
            origin=jnp.zeros((2,), jnp.float32),
            cos_sin=jnp.stack([jnp.cos(th), jnp.sin(th)]),
            center=jnp.asarray([CANVAS / 2 - 0.5, CANVAS / 2 - 0.5], jnp.float32),
            t=jnp.asarray([8.0, -5.0], jnp.float32),
            src_lo=jnp.zeros((2,), jnp.float32),
            src_hi=hwf,
            canvas_hw=hwf,
        )

    def loop(step):
        """Chained fori_loop: data-dependent perturbation defeats CSE."""

        @jax.jit
        def run(x0):
            def body(i, carry):
                acc, x = carry
                y = step(x)
                return acc + y, x + (y > 0).astype(x.dtype)

            acc, _ = jax.lax.fori_loop(
                0, args.iters, body,
                (jnp.zeros((), jnp.float32), x0),
            )
            return acc

        return run

    def timed(name, run, x0):
        float(run(x0))  # real compile (CLAUDE.md: lazy remote compile)
        best = np.inf
        for _ in range(args.trials):
            t0 = time.perf_counter()
            v = float(run(x0))
            best = min(best, time.perf_counter() - t0)
            assert np.isfinite(v)
        us_img = best / (args.iters * b) * 1e6
        row = {
            "stage": name, "batch": b, "iters": args.iters,
            "best_s": round(best, 3), "us_per_img": round(us_img, 1),
            "img_per_s": round(args.iters * b / best, 1),
        }
        print(json.dumps(row), flush=True)
        return row

    rows = []
    stages = args.stages or [
        "warp128", "maskwarp128", "maskbox128", "pre128", "prenorot128",
    ]

    if "warp128" in stages:
        def step(img_f):
            def one(img, th):
                return jnp.sum(warp_image_rotated(img, rot_params(th), (OUT, OUT)))
            return jnp.sum(jax.vmap(one)(img_f, thetas))

        rows.append(timed(
            "warp128", loop(step), batch["image"].astype(jnp.float32)
        ))

    if "maskwarp128" in stages:
        def step_m(msk_f):
            def one(m, th):
                return jnp.sum(
                    warp_image_rotated(m[..., None], rot_params(th), (OUT, OUT))
                )
            return jnp.sum(jax.vmap(one)(msk_f, thetas))

        rows.append(timed(
            "maskwarp128", loop(step_m), batch["mask"].astype(jnp.float32)
        ))

    if "maskbox128" in stages:
        def step_b(msk_f):
            def one(m, th):
                box, valid = rotated_mask_box(
                    m, (jnp.float32(4.0), jnp.float32(-3.0)), th, hwf
                )
                return jnp.sum(box) + valid.astype(jnp.float32)
            return jnp.sum(jax.vmap(one)(msk_f, thetas))

        rows.append(timed(
            "maskbox128", loop(step_b), batch["mask"].astype(jnp.float32)
        ))

    if "warp128_2level" in stages:
        from instancesegmentation_tpu.ops.warp import (
            warp_image_rotated_2level,
        )

        def step_2l(img_f):
            def one(img, th):
                return jnp.sum(warp_image_rotated_2level(
                    img, rot_params(th), (OUT, OUT), theta_max_deg=25.0
                ))
            # staged like the pipeline (chunk=8): bounds the live hats
            return jnp.sum(jax.lax.map(
                lambda t2: one(*t2), (img_f, thetas), batch_size=8
            ))

        rows.append(timed(
            "warp128_2level", loop(step_2l), batch["image"].astype(jnp.float32)
        ))

    pre_stages = [("pre128", 25.0, None, None), ("prenorot128", 0.0, None, None)]
    for s in stages:
        if s == "pre128_2level":
            pre_stages.append((s, 25.0, "2level", None))
        elif s.startswith("pre128_2level_b"):
            pre_stages.append((s, 25.0, "2level", int(s.rsplit("_b", 1)[1])))
        elif s.startswith("pre128_c"):  # 2pass chunk sweep: pre128_c8
            pre_stages.append((s, 25.0, "2pass", -int(s.rsplit("_c", 1)[1])))
    for name, rot, impl, blk in pre_stages:
        if name not in stages:
            continue
        extra = {}
        if impl:
            extra["rotate_impl"] = impl
        if blk is not None and blk > 0:
            extra["rotate_block"] = blk
        if blk is not None and blk < 0:
            extra["rotate_chunk"] = -blk
        aug = AugmentConfig(out_size=(OUT, OUT), rotate=rot,
                            flip_prob=0.5, jitter=0.1, **extra)

        def step_p(img_u8, aug=aug):
            bt = dict(batch, image=img_u8)
            images, heatmaps, masks = preprocess_batch(
                bt, jax.random.PRNGKey(0), aug
            )
            return (jnp.sum(images) + jnp.sum(heatmaps) + jnp.sum(masks))

        @jax.jit
        def run_p(x0, aug=aug):
            def body(i, carry):
                acc, x = carry
                bt = dict(batch, image=x)
                images, heatmaps, masks = preprocess_batch(
                    bt, jax.random.fold_in(jax.random.PRNGKey(0), i), aug
                )
                y = jnp.sum(images) + jnp.sum(heatmaps) + jnp.sum(masks)
                bump = (images[:, :1, :1, 0] > 0).astype(x.dtype)
                return acc + y, x.at[:, :1, :1, 0].add(bump)

            acc, _ = jax.lax.fori_loop(
                0, args.iters, body, (jnp.zeros((), jnp.float32), x0)
            )
            return acc

        rows.append(timed(name, run_p, batch["image"]))

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ROT_TIME_PROBE.json")
    # merge: partial --stages runs update their rows without erasing
    # the rest of the decomposition
    merged = {}
    if os.path.exists(out):
        try:
            with open(out) as f:
                merged = {r["stage"]: r for r in json.load(f).get("rows", [])}
        except (json.JSONDecodeError, KeyError):
            merged = {}
    for r in rows:
        merged[r["stage"]] = r
    with open(out, "w") as f:
        json.dump({"rows": list(merged.values())}, f, indent=1)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
