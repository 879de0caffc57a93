"""Serving-time A/B of BatchNorm folding (VERDICT r4 next#5).

ROOFLINE.md conclusion 2 attributes ~57% of the headline program's
XLA-counted bytes to a batch-size-independent term (lane padding,
relayout scratch, per-conv weight re-reads).  One attributable piece
is the inference BN affine: every ConvBN applies a per-channel
multiply+add whose operands are runtime arrays, so XLA must keep the
ops.  ``models/export.fold_batchnorm`` bakes the affine into the conv
weights and resets BN to exact identity; with the folded variables
closed over the jit (flax's small [C] arrays inline as HLO literals),
XLA's algebraic simplifier removes the identity multiplies — verified
on CPU HLO: 229 -> 96 multiplies on the 512² serving program.

This probe times the EXACT bench.py headline body (512², batch 128,
bf16, truncated backbone + folded section-6 head + sigmoid, chained
fori_loop) with live vs folded variables and writes FOLD_BN_PROBE.json.
The expectation is honesty, not hope: the net is memory-bound and XLA
already fuses the affine into conv epilogues, so the win may be ~0 —
either way the number pins the claim.

Usage: python tools/fold_bn_probe.py [--batch 128 --iters 30 --trials 3]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SIZE = 512


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--trials", type=int, default=3)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from instancesegmentation_tpu.models.export import fold_batchnorm
    from instancesegmentation_tpu.models.fused_head import fold_head, head_apply
    from instancesegmentation_tpu.models.segment import Segment

    model = Segment(in_channels=3, dtype=jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)), train=False
    )

    rng = np.random.default_rng(0)
    batch = jax.device_put(jnp.asarray(rng.integers(
        0, 255, size=(args.batch, SIZE, SIZE, 3), dtype=np.uint8
    )))

    def build(variants):
        head = fold_head(variants["params"])

        @jax.jit
        def loop(images_u8):
            def body(i, carry):
                acc, img = carry
                x = img.astype(jnp.bfloat16) * jnp.bfloat16(1 / 127.5) - 1.0
                feats = model.apply(
                    variants, x, train=False, truncate_head=True
                )
                probs = jax.nn.sigmoid(head_apply(feats, head, dtype=jnp.bfloat16))
                acc = acc + jnp.sum(probs)
                bump = (probs[:, :1, :1, 0] > 0.5).astype(jnp.uint8)
                img = img.at[:, :1, :1, 0].add(bump)
                return acc, img

            acc, _ = jax.lax.fori_loop(
                0, args.iters, body, (jnp.zeros((), jnp.float32), images_u8)
            )
            return acc

        return loop

    rows = []
    outs = {}
    for name, v in (("live", variables), ("folded", fold_batchnorm(variables))):
        loop = build(v)
        float(loop(batch))  # real compile (lazy remote compile, CLAUDE.md)
        best = np.inf
        for _ in range(args.trials):
            t0 = time.perf_counter()
            val = float(loop(batch))
            best = min(best, time.perf_counter() - t0)
            assert np.isfinite(val)
        outs[name] = val
        ips = args.batch * args.iters / best
        rows.append({
            "arm": name, "batch": args.batch, "iters": args.iters,
            "best_s": round(best, 4),
            "img_per_s": round(ips, 1),
            "us_per_img": round(best / (args.batch * args.iters) * 1e6, 2),
            "checksum": val,
        })
        print(json.dumps(rows[-1]), flush=True)

    # numerical sanity: folded checksum within bf16 rounding of live
    rel = abs(outs["folded"] - outs["live"]) / max(1.0, abs(outs["live"]))
    result = {
        "rows": rows,
        "checksum_rel_diff": rel,
        "speedup_folded_over_live": round(
            rows[1]["img_per_s"] / rows[0]["img_per_s"], 4
        ),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "FOLD_BN_PROBE.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
