"""On-chip proposal-matching probe: is the XLA max/argmax formulation
(ops/matching.match_proposals) at the op's latency floor, and what does
the single-kernel Pallas form measure?

The matching docstring claims "the XLA formulation is a single fused
max/argmax pass and is already at the op's latency floor" — the exact
kind of claim NMS carried until the r4 probe refuted it by measurement
(NMS_PROBE.json: 3.57x over floor at N=1024).  Same methodology here
(bench.py chained fori_loop, one scalar readback):

- xla:    ops.matching.match_proposals on a [P, G] IoU matrix
- pallas: ops.matching.match_proposals_pallas — same math, ONE kernel
- floor:  consume the IoU matrix with one row-reduction and no
          matching logic (the latency of touching the input at all)

Unlike NMS there is no sequential scan in the op, so xla_over_floor ~ 1
is the expected (claim-confirming) outcome; >> 1 would refute it.

Prints one JSON line per (P, G); writes MATCH_PROBE.json with --write.
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
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--shapes", type=str, nargs="+",
                   default=["512x8", "1024x16", "2048x32", "4096x64"],
                   help="PxG proposal-by-gt matrix shapes")
    p.add_argument("--cpu", action="store_true", help="smoke-test on CPU")
    p.add_argument("--write", action="store_true",
                   help="write MATCH_PROBE.json at the repo root")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from instancesegmentation_tpu.ops.matching import (
        match_proposals,
        match_proposals_pallas,
    )

    def variant_loop(variant):
        def one(iou):
            if variant == "xla":
                return match_proposals(iou)
            if variant == "pallas":
                return match_proposals_pallas(iou)
            # floor: touch every IoU entry once, no matching logic
            m = jnp.max(iou, axis=1)
            return m.astype(jnp.int32), (m > 0.5).astype(jnp.int32)

        @jax.jit
        def run(iou):
            def body(i, carry):
                acc, x = carry
                matched, labels = one(x)
                s = jnp.sum(labels.astype(jnp.float32)) + jnp.sum(
                    matched.astype(jnp.float32)
                )
                # data-depend the next input on this output
                x = x + (s % 2.0) * 1e-7
                return acc + s, x

            acc, _ = jax.lax.fori_loop(
                0, args.iters, body, (jnp.zeros((), jnp.float32), iou)
            )
            return acc

        return run

    rows = []
    for shape in args.shapes:
        pn, gn = (int(v) for v in shape.split("x"))
        rng = np.random.default_rng(0)
        iou = jnp.asarray(rng.uniform(0, 1, size=(pn, gn)).astype(np.float32))

        row = {"p": pn, "g": gn, "iters": args.iters}
        for variant in ("floor", "xla", "pallas"):
            try:
                dt = _timed(variant_loop(variant), iou)
                row[f"{variant}_us"] = round(dt / args.iters * 1e6, 1)
            except Exception as e:  # pallas may fail on some backends
                row[f"{variant}_error"] = f"{type(e).__name__}: {e}"[:200]
        if "xla_us" in row and "floor_us" in row:
            row["xla_over_floor"] = round(row["xla_us"] / row["floor_us"], 2)
        if "pallas_us" in row and "xla_us" in row:
            row["pallas_over_xla"] = round(
                row["pallas_us"] / row["xla_us"], 3
            )
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.write:
        out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "MATCH_PROBE.json",
        )
        with open(out, "w") as f:
            json.dump({"rows": rows}, f, indent=1)
        print(f"wrote {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
