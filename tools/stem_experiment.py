"""A/B the space-to-depth stem re-lowering (models/fused_stem.py) on chip.

HBM_PROBE.json spans mode showed the stem is the one serving span
running materially above its per-conv traffic floor (1.8x, 28 µs/img
standalone at batch 128).  This times, with the bench.py fori_loop
methodology (the only timing the axon tunnel can't distort):

  1. stem-only: InitHeadS4 vs fold_stem/stem_apply, u8 image in;
  2. the FULL fused serving program (normalize + net + folded head +
     sigmoid) with and without the folded stem — the number that
     matters, since cross-span fusion absorbs part of any standalone
     win.

Usage: python tools/stem_experiment.py [--batch 128] [--size 512] [--mode both]
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
    float(fn(*args))  # value-forced warmup pays the remote compile
    t0 = time.perf_counter()
    checksum = float(fn(*args))
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)
    return dt


def _loop(body, images_u8, iters):
    """Chained data-dependent fori_loop over ``body(img)->probs-like``."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(images_u8):
        def step(i, carry):
            acc, img = carry
            out = body(img)
            acc = acc + jnp.sum(out[:1, :1].astype(jnp.float32))
            bump = (acc > jnp.float32(1e30)).astype(jnp.uint8)
            img = img.at[:1, :1, :1, :1].add(bump)
            return acc, img

        acc, _ = jax.lax.fori_loop(
            0, iters, step, (jnp.zeros((), jnp.float32), images_u8)
        )
        return acc

    return run


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--mode", default="both", choices=["stem", "full", "both"])
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from instancesegmentation_tpu.models.fused_head import fold_head, head_apply
    from instancesegmentation_tpu.models.fused_stem import fold_stem, stem_apply
    from instancesegmentation_tpu.models.segment import Segment

    model = Segment(in_channels=3, dtype=jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, args.size, args.size, 3)), train=False
    )
    head = fold_head(variables["params"])
    stem = fold_stem(variables)

    rng = np.random.default_rng(0)
    images = jax.device_put(
        jnp.asarray(
            rng.integers(
                0, 255, size=(args.batch, args.size, args.size, 3), dtype=np.uint8
            )
        )
    )

    def norm(img):
        return img.astype(jnp.bfloat16) * jnp.bfloat16(1 / 127.5) - 1.0

    def stem_base(img):
        from instancesegmentation_tpu.models.layers import InitHeadS4

        # apply just the init_conv subtree via the Segment param names
        class StemOnly(__import__("flax").linen.Module):
            @__import__("flax").linen.compact
            def __call__(self, x):
                return InitHeadS4(planes=16, name="init_conv", dtype=jnp.bfloat16)(
                    x, False
                )

        sub_vars = {
            "params": {"init_conv": variables["params"]["init_conv"]},
            "batch_stats": {"init_conv": variables["batch_stats"]["init_conv"]},
        }
        return StemOnly().apply(sub_vars, norm(img))

    def stem_s2d(img):
        return stem_apply(norm(img), stem, dtype=jnp.bfloat16)

    def full_base(img):
        feats = model.apply(variables, norm(img), train=False, truncate_head=True)
        return jax.nn.sigmoid(head_apply(feats, head, dtype=jnp.bfloat16))

    def full_s2d(img):
        init_down = stem_apply(norm(img), stem, dtype=jnp.bfloat16)
        feats = model.apply(
            variables, init_down, train=False, truncate_head=True, skip_stem=True
        )
        return jax.nn.sigmoid(head_apply(feats, head, dtype=jnp.bfloat16))

    out = {"batch": args.batch, "size": args.size, "iters": args.iters}
    n = args.batch * args.iters
    if args.mode in ("stem", "both"):
        dt_a = _timed(_loop(stem_base, images, args.iters), images)
        dt_b = _timed(_loop(stem_s2d, images, args.iters), images)
        out["stem_us_per_img"] = round(dt_a / n * 1e6, 2)
        out["stem_s2d_us_per_img"] = round(dt_b / n * 1e6, 2)
        out["stem_speedup"] = round(dt_a / dt_b, 3)
    if args.mode in ("full", "both"):
        dt_a = _timed(_loop(full_base, images, args.iters), images)
        dt_b = _timed(_loop(full_s2d, images, args.iters), images)
        out["full_img_per_s"] = round(n / dt_a, 1)
        out["full_s2d_img_per_s"] = round(n / dt_b, 1)
        out["full_speedup"] = round(dt_a / dt_b, 3)
        # numeric agreement of the two full programs (bf16): compare on
        # a small slice to keep the readback tiny
        a = full_base(images[:2])
        b = full_s2d(images[:2])
        out["full_max_abs_diff"] = float(jnp.max(jnp.abs(a - b)))
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
