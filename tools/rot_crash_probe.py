"""Bisect the train_rot TPU-worker crash (r4).

`tools/roofline.py --mode train_rot` crashed the axon TPU worker 3/3
times ("TPU worker process crashed or restarted ... kernel fault")
while every other r4 probe ran clean, so the rotated-warp training
program itself faults the chip.  Gradients do not flow through the
preprocess (loss is d/d params), so the suspect set is the forward
rotated path: the 4-tap flat gather (ops/warp.warp_image_rotated), the
O(canvas^2) rotated_mask_box reduction, or the composed
preprocess/train program.

Each stage runs in its OWN child process (a worker crash poisons the
parent's backend) and reports one JSON line; the parent aggregates to
ROT_CRASH_PROBE.json.

Stages (all 640px canvas -> 480px out unless noted):
  gather1      warp_image_rotated, one image
  gather8      vmapped gather, batch 8
  gather128    vmapped gather, batch 128
  maskbox128   rotated_mask_box vmapped, batch 128
  pre8/pre128  full preprocess_batch with rotate=25
  train8/128   full train step (fwd+bwd+adam) with rotate=25
  cost8        roofline's lower().compile().cost_analysis() on train8

First run (ROT_CRASH_PROBE.json): every stage incl. train8 passed in
isolation (pre8 hit the child timeout on compile; pre128 then passed),
so the roofline train_rot crash is NOT a single-op fault.

Usage: python tools/rot_crash_probe.py            # parent, all stages
       python tools/rot_crash_probe.py --stage X  # one stage (child)
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CANVAS = 640
OUT = 480
STAGES = [
    "gather1", "gather8", "gather128", "maskbox128",
    "pre8", "pre128", "train8", "train128", "cost8",
    # trainNNs runs the same batch-NNN rotated train step with the
    # lax.map-staged warp (rotate_chunk=32); trainNNN forces
    # rotate_chunk=0.  oneNN[s] dispatches ONE step (the Trainer's real
    # per-step program, no fori_loop harness).  Measured verdict
    # (ROOFLINE.md §6): one128 AND one128s pass, train128 AND train128s
    # crash — the fault is the 30-iter fori_loop bench composition, not
    # the train step; real rotated batch-128 training is safe.
    "train128s", "one128", "one128s",
]


def _run_stage(stage: str) -> int:
    import jax
    import jax.numpy as jnp

    from instancesegmentation_tpu.data.synthetic import synthetic_host_batch
    from instancesegmentation_tpu.ops.warp import (
        RotWarpParams,
        rotated_mask_box,
        warp_image_rotated,
    )

    t0 = time.time()

    def params(theta: float) -> RotWarpParams:
        h = w = float(CANVAS)
        return RotWarpParams(
            scale=jnp.asarray([h / OUT, w / OUT], jnp.float32),
            origin=jnp.zeros((2,), jnp.float32),
            cos_sin=jnp.asarray([np.cos(theta), np.sin(theta)], jnp.float32),
            center=jnp.asarray([h / 2 - 0.5, w / 2 - 0.5], jnp.float32),
            t=jnp.asarray([8.0, -5.0], jnp.float32),
            src_lo=jnp.zeros((2,), jnp.float32),
            src_hi=jnp.asarray([h, w], jnp.float32),
            canvas_hw=jnp.asarray([h, w], jnp.float32),
        )

    if stage.startswith("gather"):
        b = int(stage[len("gather"):])
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(
            rng.integers(0, 255, (b, CANVAS, CANVAS, 3), np.uint8)
        )
        thetas = jnp.linspace(-0.4, 0.4, b)

        @jax.jit
        def run(imgs, thetas):
            def one(img, th):
                p = params(0.3)._replace(
                    cos_sin=jnp.stack([jnp.cos(th), jnp.sin(th)])
                )
                return warp_image_rotated(img, p, (OUT, OUT))

            return jnp.sum(jax.vmap(one)(imgs, thetas))

        checksum = float(run(imgs, thetas))
    elif stage == "maskbox128":
        rng = np.random.default_rng(0)
        masks = jnp.asarray(
            rng.integers(0, 2, (128, CANVAS, CANVAS), np.uint8)
        )
        thetas = jnp.linspace(-0.4, 0.4, 128)

        @jax.jit
        def run(masks, thetas):
            box, valid = jax.vmap(
                lambda m, th: rotated_mask_box(
                    m, (jnp.float32(4.0), jnp.float32(-3.0)), th,
                    jnp.asarray([CANVAS, CANVAS], jnp.float32),
                )
            )(masks, thetas)
            return jnp.sum(box) + jnp.sum(valid)

        checksum = float(run(masks, thetas))
    elif stage.startswith("pre"):
        b = int(stage[len("pre"):])
        import jax.random as jrandom

        from instancesegmentation_tpu.data.pipeline import (
            AugmentConfig,
            preprocess_batch,
        )

        batch = {
            k: jnp.asarray(v)
            for k, v in synthetic_host_batch(b, CANVAS).items()
        }
        aug = AugmentConfig(out_size=(OUT, OUT), rotate=25.0)

        @jax.jit
        def run(batch):
            images, heatmaps, masks = preprocess_batch(
                batch, jrandom.PRNGKey(0), aug
            )
            return (
                jnp.sum(images.astype(jnp.float32))
                + jnp.sum(heatmaps.astype(jnp.float32))
                + jnp.sum(masks.astype(jnp.float32))
            )

        checksum = float(run(batch))
    elif stage.startswith("train") or stage.startswith("one"):
        # trainNN[s|L][_iK]: the roofline bench program (fori_loop of
        # the step, state threaded/donated; K iterations, default 30).
        # oneNN[s|L]: ONE dispatched train step — what Trainer actually
        # runs per step — to separate a real train-step fault from a
        # loop-composition artifact.  's' suffix = lax.map-staged
        # rotated warp (rotate_chunk=32); 'L' = the r5 2level sampler
        # (rotate_impl="2level").  '_iK' narrows the 5-passes/30-faults
        # threshold (VERDICT r4 next#4): e.g. train128_i10 train128_i20.
        prefix = "train" if stage.startswith("train") else "one"
        spec = stage[len(prefix):]
        iters = None
        if "_i" in spec:
            spec, it = spec.split("_i", 1)
            iters = int(it)
        staged = spec.endswith("s")
        spec = spec.rstrip("s")
        two_level = spec.endswith("L")
        b = int(spec.rstrip("L"))
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        sys.argv = ["rot_crash_probe"]
        import tools.roofline as roofline
        from tools.roofline import build_train

        if iters is not None:
            roofline.ITERS = iters
        single, bench_loop, args_ = build_train(
            b, OUT, rotate=25.0, rotate_chunk=(32 if staged else 0),
            rotate_impl=("2level" if two_level else None),
        )
        if prefix == "one":
            state, batch, rng = args_
            state2, metrics = jax.jit(single)(state, batch, rng)
            checksum = float(metrics["loss"])
            del state2
        else:
            checksum = float(bench_loop(*args_))
    elif stage == "cost8":
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        sys.argv = ["rot_crash_probe"]
        from tools.roofline import build_train

        single, _, args_ = build_train(8, OUT, rotate=25.0)
        cost = jax.jit(single).lower(*args_).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        checksum = float(cost.get("flops", 0.0))
    else:
        raise SystemExit(f"unknown stage {stage}")

    print(json.dumps({
        "stage": stage, "ok": True,
        "checksum_finite": bool(np.isfinite(checksum)),
        "seconds": round(time.time() - t0, 1),
    }), flush=True)
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--stage", default=None)
    p.add_argument("--timeout", type=int, default=900)
    p.add_argument("--stages", nargs="+", default=None,
                   help="parent mode: run only these stages (each in "
                        "its own child process); results MERGE into "
                        "ROT_CRASH_PROBE.json by stage name")
    args = p.parse_args(argv)
    if args.stage:
        return _run_stage(args.stage)

    rows = []
    for stage in (args.stages or STAGES):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--stage", stage],
                capture_output=True, text=True, timeout=args.timeout,
            )
            line = next(
                (l for l in r.stdout.splitlines() if l.startswith("{")), None
            )
            if r.returncode == 0 and line:
                rows.append(json.loads(line))
            else:
                rows.append({
                    "stage": stage, "ok": False, "rc": r.returncode,
                    "err_tail": (r.stderr or "")[-400:],
                })
        except subprocess.TimeoutExpired:
            rows.append({"stage": stage, "ok": False, "rc": "timeout"})
        print(json.dumps(rows[-1]), flush=True)
        if not rows[-1].get("ok"):
            time.sleep(60)  # give the worker time to restart
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ROT_CRASH_PROBE.json")
    merged = {}
    if args.stages and os.path.exists(out):
        try:
            with open(out) as f:
                merged = {r["stage"]: r for r in json.load(f)["rows"]}
        except (json.JSONDecodeError, KeyError):
            merged = {}
    for r in rows:
        merged[r["stage"]] = r
    with open(out, "w") as f:
        json.dump({"rows": list(merged.values())}, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
