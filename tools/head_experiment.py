"""Decompose the folded head's 17.5 µs/img (HBM_PROBE.json spans mode).

The head span runs at 4.25x its per-conv traffic floor — the worst
ratio in the net.  Candidate costs: (1) the four border-correction
convt+conv chains (8 small ops/iteration, latency- not byte-bound),
(2) the pixel-shuffle relayout to /1, (3) the /1-resolution sigmoid.
This times, with the fori_loop methodology:

  a. full head_apply + sigmoid            (the serving form)
  b. interior only (no border correction) (isolates 1)
  c. phase conv + sigmoid, NO shuffle     (isolates 2; output [N,h,w,16])
  d. phase conv only, f32 cast out        (isolates 3)

Usage: python tools/head_experiment.py [--batch 128] [--size 512]
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
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from instancesegmentation_tpu.models.fused_head import (
        S,
        _conv,
        fold_head,
        head_apply,
    )
    from instancesegmentation_tpu.models.segment import Segment

    size = args.size
    model = Segment(in_channels=3, dtype=jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), train=False
    )
    head = fold_head(variables["params"])

    rng = np.random.default_rng(0)
    feat = jax.device_put(
        jnp.asarray(
            rng.normal(size=(args.batch, size // 4, size // 4, 16)).astype(
                np.float32
            ),
            jnp.bfloat16,
        )
    )
    dt16 = jnp.bfloat16

    def full(x):
        return jax.nn.sigmoid(head_apply(x, head, dtype=dt16))

    def interior(x):
        n, h, w, _ = x.shape
        conv_out = _conv(x.astype(dt16), head.phase_kernel.astype(dt16), ((1, 1), (1, 1)))
        out = (
            conv_out.reshape(n, h, w, S, S)
            .transpose(0, 1, 3, 2, 4)
            .reshape(n, S * h, S * w, 1)
        )
        return jax.nn.sigmoid(out + head.bias.astype(dt16))

    def noshuffle(x):
        conv_out = _conv(x.astype(dt16), head.phase_kernel.astype(dt16), ((1, 1), (1, 1)))
        return jax.nn.sigmoid(conv_out + head.bias.astype(dt16))

    def convonly(x):
        return _conv(
            x.astype(dt16), head.phase_kernel.astype(dt16), ((1, 1), (1, 1))
        ) + head.bias.astype(dt16)

    def loop(body):
        @jax.jit
        def run(x0):
            def step(i, carry):
                acc, x = carry
                out = body(x)
                acc = acc + jnp.sum(out[:1, :1].astype(jnp.float32))
                bump = (acc > jnp.float32(1e30)).astype(x.dtype)
                return acc, x.at[0, 0, 0, 0].add(bump)

            return jax.lax.fori_loop(
                0, args.iters, step, (jnp.zeros((), jnp.float32), x0)
            )[0]

        return run

    n = args.batch * args.iters
    out = {"batch": args.batch, "size": size}
    for name, body in [
        ("full", full),
        ("interior", interior),
        ("noshuffle", noshuffle),
        ("convonly", convonly),
    ]:
        dt = _timed(loop(body), feat)
        out[f"{name}_us_per_img"] = round(dt / n * 1e6, 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
