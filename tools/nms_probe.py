"""On-chip NMS probe: is the XLA fori_loop NMS at the op's latency
floor, and does the single-kernel Pallas scan (ops/nms.nms_pallas) beat
it?  (VERDICT r3 next#6: close the Pallas north-star letter or measure
it closed.)

Three timings per N, bench.py methodology (chained jitted fori_loop
with a data dependency between iterations, one scalar readback):

- xla:    ops.nms.nms — argsort + O(N^2) IoU + N-iteration XLA scan
- pallas: ops.nms.nms_pallas — same sort/IoU, scan as ONE Pallas kernel
- floor:  sort + IoU + rank/take WITHOUT any suppression scan (an
          unsound "NMS" that keeps everything) — the latency of the
          non-sequential work alone.  xla_over_floor ~ 1 means the
          sequential scan is free and there is nothing for a kernel to
          win; >> 1 means the scan dominates and the Pallas number
          decides.

Prints one JSON line per N; writes NMS_PROBE.json at the repo root
with the full table when --write is passed.
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
    p.add_argument("--sizes", type=int, nargs="+",
                   default=[128, 256, 512, 1024])
    p.add_argument("--cpu", action="store_true", help="smoke-test on CPU")
    p.add_argument("--write", action="store_true",
                   help="write NMS_PROBE.json at the repo root")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from instancesegmentation_tpu.ops.nms import (
        box_iou_jnp,
        nms,
        nms_pallas,
    )

    def variant_loop(variant, n):
        def one(boxes, scores):
            if variant == "xla":
                idx, valid = nms(boxes, scores, 0.5)
                return idx, valid
            if variant == "pallas":
                idx, valid = nms_pallas(boxes, scores, 0.5)
                return idx, valid
            # floor: every non-sequential piece of nms(), no scan.
            # The row-max reduction consumes ALL N^2 IoU entries so XLA
            # cannot dead-code-eliminate the matrix build (a single-row
            # consume lets the slice sink through the elementwise chain
            # and compute only N IoUs).
            order = jnp.argsort(-scores, stable=True)
            sboxes = boxes[order]
            iou = box_iou_jnp(sboxes, sboxes)
            alive = jnp.max(iou, axis=1) < 2.0  # keeps all
            rank = jnp.where(alive, jnp.arange(n), n + jnp.arange(n))
            take = jnp.argsort(rank)
            valid = alive[take]
            return jnp.where(valid, order[take], -1), valid

        @jax.jit
        def run(boxes, scores):
            def body(i, carry):
                acc, s = carry
                idx, valid = one(boxes, s)
                kept = jnp.sum(valid.astype(jnp.float32))
                # data-depend next scores on this output so iterations
                # cannot be hoisted or deduped
                s = s + (kept % 2.0) * 1e-7
                return acc + kept, s

            acc, _ = jax.lax.fori_loop(
                0, args.iters, body, (jnp.zeros((), jnp.float32), scores)
            )
            return acc

        return run

    rows = []
    for n in args.sizes:
        rng = np.random.default_rng(0)
        x0 = rng.uniform(0, 400, size=n)
        y0 = rng.uniform(0, 400, size=n)
        boxes = jnp.asarray(
            np.stack(
                [x0, y0, x0 + rng.uniform(10, 120, n),
                 y0 + rng.uniform(10, 120, n)], -1
            ).astype(np.float32)
        )
        scores = jnp.asarray(rng.uniform(0, 1, size=n).astype(np.float32))

        row = {"n": n, "iters": args.iters}
        for variant in ("floor", "xla", "pallas"):
            if variant == "pallas" and n > 1408:
                # nms_pallas trace-time VMEM fallback would silently
                # measure the XLA path and mislabel it
                row["pallas_skipped"] = "n>1408 uses the XLA fallback"
                continue
            try:
                dt = _timed(variant_loop(variant, n), boxes, scores)
                row[f"{variant}_us"] = round(dt / args.iters * 1e6, 1)
            except Exception as e:  # pallas may fail on some backends
                row[f"{variant}_error"] = f"{type(e).__name__}: {e}"[:200]
        if "xla_us" in row and "floor_us" in row:
            row["xla_over_floor"] = round(row["xla_us"] / row["floor_us"], 2)
        if "pallas_us" in row and "xla_us" in row:
            row["pallas_over_xla"] = round(row["pallas_us"] / row["xla_us"], 3)
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.write:
        out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "NMS_PROBE.json",
        )
        with open(out, "w") as f:
            json.dump({"rows": rows}, f, indent=1)
        print(f"wrote {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
