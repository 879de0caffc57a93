"""Gate probe for an int8 (PTQ) serving path: does an int8 conv chain
actually beat bf16 on this chip?

The serving program is memory-bound (ROOFLINE.md: batch-128 implies
~33 MB/img of real traffic at the measured 510 GB/s), so int8
activations halving every conv's I/O could be worth up to ~2x on the
interior spans — IF XLA:TPU lowers s8xs8->s32 convs onto the int8 MXU
path and the requantize fuses into the conv epilogue.  This measures
exactly that before any PTQ machinery is built: chains of 3x3 convs at
the net's real (H, C) operating points (models/segment.py channel
plan: /4 36ch@128^2, /8 48ch@64^2, /16 128ch@32^2, bottleneck-interior
16ch@64^2), batch 128, bf16 vs int8+requant.

Methodology: bench.py's chained fori_loop, one scalar readback.
Prints one JSON line per shape with us/img for both dtypes and the
ratio; a ratio < ~0.85 on the big shapes justifies building the
quantized forward, anything near 1.0 kills it (record the negative).
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
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--depth", type=int, default=8, help="convs per chain")
    p.add_argument("--cpu", action="store_true", help="smoke-test on CPU")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    b, depth = args.batch, args.depth

    def conv(x, k, acc_t, groups=1):
        kh = k.shape[0]
        p = kh // 2
        return jax.lax.conv_general_dilated(
            x, k,
            window_strides=(1, 1),
            padding=((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=acc_t,
        )

    def bf16_chain(x, ks, groups=1):
        for k in ks:
            x = jnp.maximum(conv(x, k, jnp.bfloat16, groups), 0)
        return x

    def int8_chain(x, ks, scale, groups=1):
        # per-layer requant: s32 accum -> f32 scale -> clip/round -> s8.
        # One multiplier per layer (per-tensor); the per-channel variant
        # adds only a [C] broadcast, same traffic.
        for k in ks:
            acc = conv(x, k, jnp.int32, groups)
            y = acc.astype(jnp.float32) * scale
            y = jnp.maximum(y, 0)  # relu in the epilogue, like bf16 chain
            x = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)
        return x

    res_all = []
    for name, hw, c, kk, groups in [
        # 3x3 dense at each span's (H, C) operating point
        ("s4_128px_36c_3x3", 128, 36, 3, 1),
        ("s8_64px_48c_3x3", 64, 48, 3, 1),
        ("s16_32px_128c_3x3", 32, 128, 3, 1),
        # the bottleneck interior ops the net actually runs:
        # 1x1 pointwise at full section width, depthwise 3x3 at planes
        ("s8_64px_48c_1x1", 64, 48, 1, 1),
        ("s16_32px_128c_1x1", 32, 128, 1, 1),
        ("s8_64px_16c_dw3x3", 64, 16, 3, 16),
        ("s16_32px_48c_dw3x3", 32, 48, 3, 48),
    ]:
        cin = c // groups
        ks_f = [
            jnp.asarray(
                rng.normal(0, 0.05, size=(kk, kk, cin, c)).astype(np.float32)
            )
            for _ in range(depth)
        ]
        ks_bf = [k.astype(jnp.bfloat16) for k in ks_f]
        ks_i8 = [
            jnp.clip(jnp.round(k * 127 / 0.2), -127, 127).astype(jnp.int8)
            for k in ks_f
        ]
        x_bf = jnp.asarray(
            rng.normal(0, 1, size=(b, hw, hw, c)).astype(np.float32),
            jnp.bfloat16,
        )
        x_i8 = jnp.clip(
            jnp.round(np.asarray(x_bf, np.float32) * 32), -127, 127
        ).astype(jnp.int8)
        scale = jnp.float32(1 / 64.0)

        def loop(body, x0, *rest):
            @jax.jit
            def run(x0, *rest):
                def step(i, carry):
                    acc, x = carry
                    outv = body(x, *rest)
                    acc = acc + jnp.sum(outv[:1, :1, :1].astype(jnp.float32))
                    bump = (acc > jnp.float32(1e30)).astype(x.dtype)
                    return acc, x.at[0, 0, 0, 0].add(bump)

                return jax.lax.fori_loop(
                    0, args.iters, step, (jnp.zeros((), jnp.float32), x0)
                )[0]

            return run

        n = b * args.iters
        t_bf = _timed(
            loop(lambda x, ks: bf16_chain(x, ks, groups), x_bf, ks_bf),
            x_bf, ks_bf,
        )
        t_i8 = _timed(
            loop(lambda x, ks: int8_chain(x, ks, scale, groups), x_i8, ks_i8),
            x_i8, ks_i8,
        )
        row = {
            "shape": name,
            "depth": depth,
            "bf16_us_per_img": round(t_bf / n * 1e6, 2),
            "int8_us_per_img": round(t_i8 / n * 1e6, 2),
            "int8_over_bf16": round(t_i8 / t_bf, 3),
        }
        res_all.append(row)
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
