"""Decompose the folded-stem (patch-conditioning) pipeline cost.

First full measurement (tools/instance_experiment.py) showed the folded
conditioned forward at ~2.9 ms/img vs 87 µs dense — a 34x pathology,
not a close loss.  This isolates each stage at batch 128 / 480² to find
it:

  render   patch render only (render_heatmap_patches vmapped)
  gconv    feature_group_count=17 conv on pre-made patches
  dotconv  same contraction as 25-shift im2col + k-batched dot_general
  scatter  _accumulate_conv_patches on pre-made deltas
  pooled   _pooled_hm_planes on pre-made patches
  full     stem_hm_apply end to end
  dense    folded dense stem (conv on the 20-ch concat) for reference

Usage: python tools/stem_hm_experiment.py [--batch 128] [--out 480]
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
    p.add_argument("--out", type=int, default=480)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from instancesegmentation_tpu.models.fused_stem_hm import (
        _accumulate_conv_patches,
        _pooled_hm_planes,
        fold_stem_hm,
        render_heatmap_patches,
        stem_hm_apply,
    )
    from instancesegmentation_tpu.models.segment import Segment

    b, out = args.batch, args.out
    dt16 = jnp.bfloat16
    rng = np.random.default_rng(0)

    model = Segment(in_channels=20, dtype=dt16)
    v = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0),
        jnp.zeros((1, out, out, 3)),
        jnp.zeros((1, out, out, 17)),
        train=False,
    )
    stem = fold_stem_hm(v)

    pts0 = jnp.asarray(
        rng.uniform(20, out - 20, size=(b, 17, 2)).astype(np.float32)
    )
    vis0 = jnp.asarray(rng.uniform(size=(b, 17)) > 0.2)
    images0 = jnp.asarray(
        rng.uniform(-1, 1, size=(b, out, out, 3)).astype(np.float32), dt16
    )

    P = 48
    OP = P // 2 + 2
    patches0 = jnp.asarray(
        rng.uniform(0, 1, size=(b, P, P, 17)).astype(np.float32), dt16
    )
    # mod-4 offsets like the real path
    offs = (rng.integers(0, (out - P) // 4, size=(b, 17, 2)) * 4).astype(
        np.int32
    )
    x00 = jnp.asarray(offs[..., 0])
    y00 = jnp.asarray(offs[..., 1])
    deltas0 = jnp.asarray(
        rng.uniform(-1, 1, size=(b, 17, OP, OP, 16)).astype(np.float32), dt16
    )
    k1_hm = stem.k1_hm.astype(dt16)  # [5,5,1,272]
    # k-batched matmul form: [17, 25, 16]
    k_dot = jnp.transpose(
        stem.k1_hm.reshape(5, 5, 17, 16), (2, 0, 1, 3)
    ).reshape(17, 25, 16).astype(dt16)

    def render(pts, vis):
        patches, x0, y0 = jax.vmap(
            lambda pp, vv: render_heatmap_patches(pp, vv, (out, out))
        )(pts, vis)
        return patches.astype(dt16)

    def gconv(patches):
        padded = jnp.pad(patches, ((0, 0), (4, 4), (4, 4), (0, 0)))
        return jax.lax.conv_general_dilated(
            padded, k1_hm,
            window_strides=(2, 2), padding="VALID",
            feature_group_count=17,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def dotconv(patches):
        padded = jnp.pad(patches, ((0, 0), (4, 4), (4, 4), (0, 0)))
        # im2col: 25 strided shifts -> [N, OP, OP, 17, 25]
        cols = jnp.stack(
            [
                padded[:, i:i + 2 * OP - 1:2, j:j + 2 * OP - 1:2, :]
                for i in range(5)
                for j in range(5)
            ],
            axis=-1,
        )
        # batch k on the MXU: [N,OP,OP,17,25] x [17,25,16] -> [N,OP,OP,17,16]
        return jax.lax.dot_general(
            cols, k_dot,
            dimension_numbers=((( 4,), (1,)), ((3,), (0,))),
        )

    def scatter(deltas, x0, y0):
        return _accumulate_conv_patches(
            deltas, x0, y0, (out, out), dt16, impl="dus"
        )

    def scatter_mm(deltas, x0, y0):
        return _accumulate_conv_patches(
            deltas, x0, y0, (out, out), dt16, impl="mm"
        )

    def pooled(patches, x0, y0):
        return _pooled_hm_planes(
            patches, x0, y0, (out, out), dt16, impl="dus"
        )

    def pooled_mm(patches, x0, y0):
        return _pooled_hm_planes(
            patches, x0, y0, (out, out), dt16, impl="mm"
        )

    def full(images, pts, vis):
        return stem_hm_apply(images, pts, vis, stem, dtype=dt16)

    def full_dot(images, pts, vis):
        return stem_hm_apply(
            images, pts, vis, stem, dtype=dt16, conv_impl="dot"
        )

    hm0 = jnp.asarray(
        rng.uniform(0, 1, size=(b, out, out, 17)).astype(np.float32), dt16
    )

    def dense(images, hm):
        x = jnp.concatenate([images, hm], axis=-1)
        y = jax.lax.conv_general_dilated(
            x,
            jnp.concatenate(
                [stem.k1_img, stem.k1_hm.reshape(5, 5, 17, 16)], axis=2
            ).astype(dt16),
            window_strides=(2, 2), padding=((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + stem.b1.astype(dt16)

    def loop(body, *xs):
        @jax.jit
        def run(*xs):
            x0v = xs[0]

            def step(i, carry):
                acc, x = carry
                outv = body(x, *xs[1:])
                acc = acc + jnp.sum(outv[:1, :1].astype(jnp.float32))
                bump = (acc > jnp.float32(1e30)).astype(x.dtype)
                return acc, x.at[(0,) * x.ndim].add(bump)

            return jax.lax.fori_loop(
                0, args.iters, step, (jnp.zeros((), jnp.float32), x0v)
            )[0]

        return run

    n = b * args.iters
    res = {"batch": b, "out": out}
    for name, timed in [
        ("render", lambda: _timed(loop(render, pts0, vis0), pts0, vis0)),
        ("gconv", lambda: _timed(loop(gconv, patches0), patches0)),
        ("dotconv", lambda: _timed(loop(dotconv, patches0), patches0)),
        ("scatter", lambda: _timed(
            loop(scatter, deltas0, x00, y00), deltas0, x00, y00)),
        ("scatter_mm", lambda: _timed(
            loop(scatter_mm, deltas0, x00, y00), deltas0, x00, y00)),
        ("pooled", lambda: _timed(
            loop(pooled, patches0, x00, y00), patches0, x00, y00)),
        ("pooled_mm", lambda: _timed(
            loop(pooled_mm, patches0, x00, y00), patches0, x00, y00)),
        ("full", lambda: _timed(
            loop(full, images0, pts0, vis0), images0, pts0, vis0)),
        ("full_dot", lambda: _timed(
            loop(full_dot, images0, pts0, vis0), images0, pts0, vis0)),
        ("dense", lambda: _timed(loop(dense, images0, hm0), images0, hm0)),
    ]:
        res[f"{name}_us_per_img"] = round(timed() / n * 1e6, 2)
        print(json.dumps(res), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
