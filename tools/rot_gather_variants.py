"""Measure alternative lowerings of the rotated 4-tap gather (r4).

ROT_TIME_PROBE.json pinned the rotated-train pathology on
``warp_image_rotated``'s flat per-pixel gather: 13.0 ms/img at batch
128 vs 79 us/img for the whole separable preprocess — a latency-bound
scalar-ish TPU gather (4 x 230k single-pixel rows).  This probe times
same-math variants to see which lowering the TPU likes:

  flat4      current: 4 separate [out^2] gathers from [H*W, C]
  slice22    ONE lax.gather of [2, 2, C] slices at (y0, x0) + in-reg lerp
  adv2d      per-tap 2-D advanced indexing img[y_idx, x_idx, :]
  onehot_mm  two-pass affine resample, each pass a per-row banded
             one-hot contraction expressed as einsum (MXU candidate;
             XLA may materialize the one-hot — measuring settles it)

All variants share the bench methodology (chained fori_loop, one
value-forced readback).  Writes ROT_GATHER_VARIANTS.json.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CANVAS = 640
OUT = 480


def make_variants(canvas: int = CANVAS, out: int = OUT) -> dict:
    """Variant factory (module-level so tests can check agreement)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    h = w = canvas
    OUT = out

    def coords(th):
        """Source sample positions for a pure rotate+scale window
        (the geometry of warp_image_rotated with t=0, whole canvas)."""
        u = lax.broadcasted_iota(jnp.float32, (OUT, OUT), 0)
        v = lax.broadcasted_iota(jnp.float32, (OUT, OUT), 1)
        py = (u + 0.5) * (h / OUT) - 0.5
        px = (v + 0.5) * (w / OUT) - 0.5
        c, s = jnp.cos(th), jnp.sin(th)
        cy = cx = h / 2.0 - 0.5
        sy = cy + (-s) * (px - cx) + c * (py - cy)
        sx = cx + c * (px - cx) + s * (py - cy)
        return sy, sx

    def weights(sy, sx):
        y0 = jnp.floor(sy)
        x0 = jnp.floor(sx)
        fy = sy - y0
        fx = sx - x0
        ok = (sy >= 0) & (sy < h - 1) & (sx >= 0) & (sx < w - 1)
        return y0.astype(jnp.int32), x0.astype(jnp.int32), fy, fx, ok

    def flat4(img, th):
        sy, sx = coords(th)
        y0, x0, fy, fx, ok = weights(sy, sx)
        flat = img.reshape(h * w, -1)

        def tap(yi, xi, wgt):
            idx = jnp.clip(yi, 0, h - 1) * w + jnp.clip(xi, 0, w - 1)
            vals = flat[idx.reshape(-1)].reshape(OUT, OUT, -1)
            return vals * (wgt * ok.astype(jnp.float32))[..., None]

        return (
            tap(y0, x0, (1 - fy) * (1 - fx))
            + tap(y0, x0 + 1, (1 - fy) * fx)
            + tap(y0 + 1, x0, fy * (1 - fx))
            + tap(y0 + 1, x0 + 1, fy * fx)
        )

    def slice22(img, th):
        sy, sx = coords(th)
        y0, x0, fy, fx, ok = weights(sy, sx)
        starts = jnp.stack(
            [jnp.clip(y0, 0, h - 2).reshape(-1),
             jnp.clip(x0, 0, w - 2).reshape(-1)], axis=-1
        )
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1),
        )
        patch = lax.gather(
            img, starts, dn, slice_sizes=(2, 2, img.shape[-1]),
            mode=lax.GatherScatterMode.CLIP,
        ).reshape(OUT, OUT, 2, 2, -1)
        fyb = fy[..., None]
        fxb = fx[..., None]
        top = patch[:, :, 0, 0] * (1 - fxb) + patch[:, :, 0, 1] * fxb
        bot = patch[:, :, 1, 0] * (1 - fxb) + patch[:, :, 1, 1] * fxb
        out = top * (1 - fyb) + bot * fyb
        return out * ok[..., None].astype(jnp.float32)

    def adv2d(img, th):
        sy, sx = coords(th)
        y0, x0, fy, fx, ok = weights(sy, sx)

        def tap(yi, xi, wgt):
            vals = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
            return vals * (wgt * ok.astype(jnp.float32))[..., None]

        return (
            tap(y0, x0, (1 - fy) * (1 - fx))
            + tap(y0, x0 + 1, (1 - fy) * fx)
            + tap(y0 + 1, x0, fy * (1 - fx))
            + tap(y0 + 1, x0 + 1, fy * fx)
        )

    def onehot_mm(img, th):
        """Two-pass affine (Catmull-Smith): horizontal then vertical
        1-D lerp resample, each expressed as a banded one-hot einsum.
        Inverse map: [sy; sx] = M [u; v] + t with
        M = [[m00, m01], [m10, m11]].  Pass 2 resolves sy via
        Y(u, v) = m00*u + m01*v + ty; pass 1 pre-samples x at
        X(y, v) = (m10/m00)*y + (m11 - m10*m01/m00)*v + cx_eff."""
        c, s = jnp.cos(th), jnp.sin(th)
        ay = ax = jnp.float32(h / OUT)
        cy = cx = h / 2.0 - 0.5
        # sy = c*ay*u + (-s)*ax*v + ty_c ; sx = s*ay*u + c*ax*v + tx_c
        off_y = (0.5 * ay - 0.5)
        ty_c = cy - c * (cy - off_y) + s * (cx - off_y)
        tx_c = cx - s * (cy - off_y) - c * (cx - off_y)
        m00, m01, m10, m11 = c * ay, -s * ax, s * ay, c * ax
        # pass 1: tmp[y, v] = img[y, X(y, v)]
        Bx = m10 / m00
        Ax = m11 - m10 * m01 / m00
        Cx = tx_c - m10 * ty_c / m00
        yi = lax.broadcasted_iota(jnp.float32, (h, OUT), 0)
        vi = lax.broadcasted_iota(jnp.float32, (h, OUT), 1)
        xpos = Ax * vi + Bx * yi + Cx                      # [h, OUT]
        x0 = jnp.floor(xpos)
        fxp = xpos - x0
        xin = lax.broadcasted_iota(jnp.float32, (w, 1), 0)  # [w, 1]
        # K1[y, x, v] built per-row inside the einsum expression
        k1 = (
            jnp.maximum(0.0, 1.0 - jnp.abs(xpos[:, None, :] - xin[None, :, :]))
        )                                                   # [h, w, OUT] hat
        okx = ((xpos >= 0) & (xpos < w - 1)).astype(jnp.float32)
        tmp = jnp.einsum("ywc,ywv->yvc", img, k1) * okx[..., None]
        # pass 2: out[u, v] = tmp[Y(u, v), v]
        ui = lax.broadcasted_iota(jnp.float32, (OUT, OUT), 0)
        vi2 = lax.broadcasted_iota(jnp.float32, (OUT, OUT), 1)
        ypos = m00 * ui + m01 * vi2 + ty_c                  # [OUT, OUT]
        yin = lax.broadcasted_iota(jnp.float32, (h, 1), 0)
        k2 = jnp.maximum(
            0.0, 1.0 - jnp.abs(ypos.transpose(1, 0)[:, None, :] - yin[None])
        )                                                   # [OUT(v), h, OUT(u)]
        oky = ((ypos >= 0) & (ypos < h - 1)).astype(jnp.float32)
        out_vuc = jnp.einsum("vyc,vyu->vuc", tmp.transpose(1, 0, 2), k2)
        return out_vuc.transpose(1, 0, 2) * oky[..., None]

    return {"flat4": flat4, "slice22": slice22, "adv2d": adv2d,
            "onehot_mm": onehot_mm}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--trials", type=int, default=2)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--variants", nargs="+", default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from jax import lax

    b = args.batch
    rng = np.random.default_rng(0)
    imgs = jax.device_put(jnp.asarray(
        rng.uniform(0, 255, (b, CANVAS, CANVAS, 3)).astype(np.float32)
    ))
    thetas = jnp.linspace(-0.4, 0.4, b)

    variants = make_variants()
    names = args.variants or list(variants)

    rows = []
    for name in names:
        fn = variants[name]

        @jax.jit
        def run(x0, fn=fn):
            def body(i, carry):
                acc, x = carry
                y = jnp.sum(jax.vmap(fn)(x, thetas))
                return acc + y, x + (y > 0).astype(x.dtype)

            acc, _ = lax.fori_loop(
                0, args.iters, body, (jnp.zeros((), jnp.float32), x0)
            )
            return acc

        try:
            float(run(imgs))  # compile
            best = np.inf
            for _ in range(args.trials):
                t0 = time.perf_counter()
                val = float(run(imgs))
                best = min(best, time.perf_counter() - t0)
                assert np.isfinite(val)
            row = {
                "variant": name, "batch": b, "iters": args.iters,
                "us_per_img": round(best / (args.iters * b) * 1e6, 1),
                "img_per_s": round(args.iters * b / best, 1),
            }
        except Exception as e:  # noqa: BLE001 - probe records failures
            row = {"variant": name, "ok": False,
                   "err": f"{type(e).__name__}: {str(e)[:200]}"}
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ROT_GATHER_VARIANTS.json")
    with open(out, "w") as f:
        json.dump({"rows": rows}, f, indent=1)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
