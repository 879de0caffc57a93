"""Roofline analysis of the Segment inference program on the attached TPU.

VERDICT r1 weak#1: the 12.2k img/s headline is 1,477x the CPU anchor but
only ~9% MFU, and nothing established whether that is the chip's
memory-bandwidth roofline for this depthwise-heavy 16-48-channel net or
leftover overhead.  This tool answers that with data:

  per batch size B in --batches:
    * compile the SINGLE-CALL fused forward (u8 normalize + Segment +
      sigmoid) and pull XLA's post-fusion ``cost_analysis()`` — FLOPs
      and "bytes accessed" are the compiler's own accounting of HBM
      traffic after all fusion decisions;
    * time the chained ``fori_loop`` program (bench.py methodology: one
      dispatch, data-dependent iterations, one scalar readback — the
      only timing the axon tunnel cannot lie about, CLAUDE.md);
    * report achieved img/s against BOTH roofline ceilings:
        compute ceiling = PEAK_FLOPS / flops_per_img
        memory  ceiling = HBM_BW    / bytes_per_img
      and the fraction of the *binding* (lower) ceiling achieved.

Run on the real chip: ``python tools/roofline.py --json ROOFLINE.json``.
TPU v5e single-chip peaks (public spec): 197 TFLOP/s bf16, 819 GB/s HBM.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_BF16_FLOPS = 197e12  # TPU v5e per-chip bf16 peak
HBM_BW = 819e9            # TPU v5e per-chip HBM bandwidth, bytes/s
SIZE = 512
ITERS = 30


def build_infer(batch_size: int, size: int = SIZE, fused: bool = False):
    """Whole-image forward.  ``fused=False`` is the r1 serving program
    (f32 normalize + full Segment); ``fused=True`` is the r2 one (bf16
    normalize + truncated backbone + folded head, bench.py:154)."""
    from instancesegmentation_tpu.models.segment import Segment

    model = Segment(in_channels=3, dtype=jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), train=False
    )
    if fused:
        from instancesegmentation_tpu.models.fused_head import (
            fold_head,
            head_apply,
        )

        head = fold_head(variables["params"])

        def forward(images_u8):
            x = images_u8.astype(jnp.bfloat16) * jnp.bfloat16(1 / 127.5) - 1.0
            feats = model.apply(variables, x, train=False, truncate_head=True)
            return jax.nn.sigmoid(head_apply(feats, head, dtype=jnp.bfloat16))

    else:

        def forward(images_u8):
            x = images_u8.astype(jnp.float32) / 127.5 - 1.0
            return jax.nn.sigmoid(model.apply(variables, x, train=False))

    @jax.jit
    def single(images_u8):
        return forward(images_u8)

    @jax.jit
    def bench_loop(images_u8):
        def body(i, carry):
            acc, img = carry
            probs = forward(img)
            acc = acc + jnp.sum(probs)
            bump = (probs[:, :1, :1, 0] > 0.5).astype(jnp.uint8)
            img = img.at[:, :1, :1, 0].add(bump)
            return acc, img

        acc, _ = jax.lax.fori_loop(
            0, ITERS, body, (jnp.zeros((), jnp.float32), images_u8)
        )
        return acc

    rng = np.random.default_rng(0)
    batch = jax.device_put(
        jnp.asarray(
            rng.integers(0, 255, size=(batch_size, size, size, 3), dtype=np.uint8)
        )
    )
    return single, bench_loop, (batch,)


def build_train(batch_size: int, size: int = 480, canvas: int = 640,
                remat: bool = False, fused_head: bool = False,
                rotate: float = 0.0, rotate_chunk: int | None = None,
                rotate_impl: str | None = None,
                rotate_block: int | None = None):
    """Full training step: fused device preprocess (crop-warp + 17-ch
    heatmap render) + conditioned fwd/bwd + Adam update, single chip —
    exactly the program Trainer dispatches per step (train/steps.py).
    The loop threads the donated TrainState through iterations, so XLA
    cannot hoist or dedupe the step body."""
    import optax

    from instancesegmentation_tpu.models.segment import Segment
    from instancesegmentation_tpu.train.config import TrainConfig
    from instancesegmentation_tpu.train.state import TrainState
    from instancesegmentation_tpu.train.steps import make_train_step

    cfg = TrainConfig(
        canvas=canvas,
        out_size=size,
        in_channels=20,
        bfloat16=True,
        batch_size=batch_size,
        flip_prob=0.5,
        jitter=0.1,
        rotate=rotate,
        remat=remat,
        fused_head=fused_head,
        **({} if rotate_chunk is None else {"rotate_chunk": rotate_chunk}),
        **({} if rotate_impl is None else {"rotate_impl": rotate_impl}),
        **({} if rotate_block is None else {"rotate_block": rotate_block}),
    )
    model = Segment(in_channels=20, dtype=jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0),
        jnp.zeros((1, size, size, 3)),
        jnp.zeros((1, size, size, 17)),
        train=False,
    )
    tx = optax.adam(cfg.learning_rate)
    state = TrainState.create(variables, tx)
    train_step = make_train_step(model, tx, cfg)  # the REAL jitted step

    single = train_step

    @jax.jit
    def bench_loop(state, batch, rng):
        def body(i, carry):
            state, rng, acc = carry
            rng, sub = jax.random.split(rng)
            state, metrics = train_step(state, batch, sub)
            return state, rng, acc + metrics["loss"]

        _, _, acc = jax.lax.fori_loop(
            0, ITERS, body, (state, rng, jnp.zeros((), jnp.float32))
        )
        return acc

    from instancesegmentation_tpu.data.synthetic import synthetic_host_batch

    batch = {
        k: jax.device_put(jnp.asarray(v))
        for k, v in synthetic_host_batch(batch_size, canvas).items()
    }
    return single, bench_loop, (state, batch, jax.random.PRNGKey(0))


def build_instance(batch_size: int, size: int = 480, canvas: int = 640):
    """The flagship fused instance program (bench.py line 1): on-device
    crop-warp from the canvas + 17-ch heatmap render + 20-ch conditioned
    forward (truncated) + folded head + sigmoid."""
    from instancesegmentation_tpu.data.pipeline import (
        AugmentConfig,
        preprocess_batch,
    )
    from instancesegmentation_tpu.models.fused_head import fold_head, head_apply
    from instancesegmentation_tpu.models.segment import Segment

    model = Segment(in_channels=20, dtype=jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0),
        jnp.zeros((1, size, size, 3)),
        jnp.zeros((1, size, size, 17)),
        train=False,
    )
    head = fold_head(variables["params"])
    aug = AugmentConfig(out_size=(size, size), out_dtype=jnp.bfloat16)

    def forward(batch):
        images, heatmaps, _ = preprocess_batch(batch, jax.random.PRNGKey(0), aug)
        feats = model.apply(
            variables, images, heatmaps, train=False, truncate_head=True
        )
        return jax.nn.sigmoid(head_apply(feats, head, dtype=jnp.bfloat16))

    @jax.jit
    def single(batch):
        return forward(batch)

    @jax.jit
    def bench_loop(batch):
        def body(i, carry):
            acc, img = carry
            probs = forward(dict(batch, image=img))
            acc = acc + jnp.sum(probs)
            bump = (probs[:, :1, :1, 0] > 0.5).astype(jnp.uint8)
            img = img.at[:, :1, :1, 0].add(bump)
            return acc, img

        acc, _ = jax.lax.fori_loop(
            0, ITERS, body, (jnp.zeros((), jnp.float32), batch["image"])
        )
        return acc

    from instancesegmentation_tpu.data.synthetic import synthetic_host_batch

    batch = {
        k: jax.device_put(jnp.asarray(v))
        for k, v in synthetic_host_batch(batch_size, canvas).items()
    }
    return single, bench_loop, (batch,)


def analyze(
    batch_size: int, size: int = SIZE, trials: int = 3, mode: str = "infer",
    chain: int = 1, rotate_impl: str | None = None,
    rotate_block: int | None = None, rotate_chunk: int | None = None,
) -> dict:
    """``chain`` > 1 times ``chain`` back-to-back dispatches of the
    ITERS-iteration device loop, each value-forced — long-horizon
    steady state as host-chained SHORT loops.  This is the harness for
    train_rot at 30-iteration equivalents: one 30-iteration fori_loop
    of the rotated batch-128 step faults the axon worker
    (ROT_CRASH_PROBE.json) while 5-10 iteration loops run clean, so
    ``--iters 5 --chain 6`` measures the same horizon safely (the
    inter-dispatch readback costs one RTT per link, amortized over
    multi-second loops)."""
    if mode in ("train", "train_remat", "train_fused", "train_rot"):
        single, bench_loop, args = build_train(
            batch_size, size, remat=(mode == "train_remat"),
            fused_head=(mode == "train_fused"),
            rotate=(25.0 if mode == "train_rot" else 0.0),
            rotate_impl=rotate_impl, rotate_block=rotate_block,
            rotate_chunk=rotate_chunk,
        )
    elif mode == "instance":
        single, bench_loop, args = build_instance(batch_size, size)
    else:
        single, bench_loop, args = build_infer(
            batch_size, size, fused=(mode == "infer_fused")
        )

    cost = jax.jit(single).lower(*args).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):  # older jax returns [dict]
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_acc = float(cost.get("bytes accessed", 0.0))

    # warm (first value-forced call pays the real remote compile,
    # CLAUDE.md), then best-of-N timed runs
    float(bench_loop(*args))
    best = np.inf
    for _ in range(trials):
        t0 = time.perf_counter()
        for _c in range(chain):
            checksum = float(bench_loop(*args))
            assert np.isfinite(checksum)
        best = min(best, time.perf_counter() - t0)

    ips = batch_size * ITERS * chain / best
    flops_img = flops / batch_size
    bytes_img = bytes_acc / batch_size
    compute_ceiling = PEAK_BF16_FLOPS / flops_img
    memory_ceiling = HBM_BW / bytes_img
    binding = min(compute_ceiling, memory_ceiling)
    return {
        "mode": mode,
        "batch": batch_size,
        "chain": chain,
        **({} if rotate_impl is None else {"rotate_impl": rotate_impl}),
        **({} if rotate_block is None else {"rotate_block": rotate_block}),
        "img_per_sec": round(ips, 1),
        "gflop_per_img": round(flops_img / 1e9, 3),
        "mb_per_img": round(bytes_img / 1e6, 2),
        "mfu_pct": round(100 * ips * flops_img / PEAK_BF16_FLOPS, 2),
        "hbm_util_pct": round(100 * ips * bytes_img / HBM_BW, 1),
        "compute_ceiling_ips": round(compute_ceiling, 0),
        "memory_ceiling_ips": round(memory_ceiling, 0),
        "bound": "memory" if memory_ceiling < compute_ceiling else "compute",
        "pct_of_roofline": round(100 * ips / binding, 1),
    }


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--batches", type=int, nargs="+", default=[32, 64, 128, 256])
    p.add_argument(
        "--size", type=int, default=None,
        help="default: 512 for infer modes, 480 (the reference training "
        "shape every committed ROOFLINE_* artifact uses) for "
        "train/train_remat/instance",
    )
    p.add_argument("--trials", type=int, default=3)
    p.add_argument(
        "--mode",
        choices=["infer", "infer_fused", "train", "train_remat",
                 "train_fused", "train_rot", "instance"],
        default="infer",
        help="infer: r1 serving program; infer_fused: r2 folded-head "
        "serving program; train/train_remat: full fused train step "
        "(preprocess + conditioned fwd/bwd + Adam), without/with "
        "jax.checkpoint; train_fused: train step with the folded "
        "section-6 head re-derived per step; train_rot: train step "
        "with --rotate 25 (gather-based rotated warp); instance: the "
        "fused conditioned instance "
        "pipeline (bench.py line 1)",
    )
    p.add_argument("--json", type=str, default=None, help="write results here")
    p.add_argument(
        "--iters", type=int, default=None,
        help="fori_loop iterations per timing (default 30).  train_rot "
        "with rotate_impl=2pass needs <=15: the axon worker faults on "
        "long loop compositions of the rotated batch-128 step "
        "(ROT_CRASH_PROBE.json: 15 passes, 20 faults) — use --iters 5 "
        "--chain 6 for a safe 30-iteration equivalent.  The 2level "
        "sampler runs the full 30-iteration loop clean.",
    )
    p.add_argument(
        "--chain", type=int, default=1,
        help="host-chain N back-to-back dispatches of the device loop "
        "per timing (value-forced between links); long-horizon steady "
        "state without long single-program loops",
    )
    p.add_argument(
        "--rotate-impl", type=str, default=None,
        choices=["2pass", "2level", "gather"],
        help="train_rot only: override AugmentConfig.rotate_impl",
    )
    p.add_argument(
        "--rotate-block", type=int, default=None,
        help="train_rot + 2level only: hat block size",
    )
    p.add_argument(
        "--rotate-chunk", type=int, default=None,
        help="train_rot only: lax.map staging chunk",
    )
    args = p.parse_args()
    if args.iters:
        global ITERS
        ITERS = args.iters
    if args.size is None:
        args.size = (
            480 if args.mode in ("train", "train_remat", "train_fused",
                         "train_rot", "instance") else SIZE
        )

    rows = []
    for b in args.batches:
        r = analyze(
            b, args.size, args.trials, args.mode, chain=args.chain,
            rotate_impl=args.rotate_impl, rotate_block=args.rotate_block,
            rotate_chunk=args.rotate_chunk,
        )
        rows.append(r)
        print(json.dumps(r), flush=True)

    if args.json:
        with open(args.json, "w") as f:
            json.dump(
                {
                    "device": str(jax.devices()[0]),
                    "peak_bf16_flops": PEAK_BF16_FLOPS,
                    "hbm_bw_bytes_per_sec": HBM_BW,
                    "size": args.size,
                    "iters_per_timing": ITERS,
                    "rows": rows,
                },
                f,
                indent=1,
            )
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
