"""Attribution of the remaining 2level rotated-warp cost (VERDICT r4
next#3 gate).

After the r5 2level landing the rotated preprocess runs 156-162 µs/img
vs the 66 µs separable floor (ROT_TIME_PROBE.json) and the 2level warp
alone 117 µs/img.  A Pallas VMEM hat-tile kernel only pays if hat
GENERATION still binds; if the banded residual shifts (pure
streamed FMA traffic XLA already fuses) dominate, the kernel attacks
the wrong term and the r4-scoped Pallas attempt should be recorded as
not-worth-it with these numbers.

Stages (batch 128, 640→480, staged lax.map chunk 8 like the pipeline,
bench fori_loop methodology):

  hats        generate the two blocked hat tensors (block 16:
              [40,480,640] + [30,480,640] f32) and reduce them
  resid       the two residual_shift passes at the real shapes/bands
              (D1=4: 9 slices over [640,640,4]; D2=5: 11 slices over
              [640,480,4])
  einsums     the two blocked contractions with data-dependent hats
  full        warp_image_rotated_2level end-to-end (cross-check vs
              ROT_TIME_PROBE's warp128_2level)

Writes ROT2LEVEL_DECOMP.json.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CANVAS = 640
OUT = 480
G = 16
THETA_MAX = 25.0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--trials", type=int, default=2)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--chunk", type=int, default=8)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from instancesegmentation_tpu.ops.warp import (
        RotWarpParams,
        warp_image_rotated_2level,
    )

    b = args.batch
    f32 = jnp.float32
    h = w = CANVAS
    rng = np.random.default_rng(0)
    imgs = jax.device_put(jnp.asarray(
        rng.integers(0, 255, (b, h, w, 4), np.uint8).astype(np.float32)
    ))
    thetas = jnp.linspace(-0.4, 0.4, b)
    t_max = math.radians(THETA_MAX)
    D1 = max(1, int(math.ceil(math.tan(t_max) * (G - 1) / 2.0)))
    sxm = (w + 2 * 24) / OUT
    D2 = max(1, int(math.ceil(math.sin(t_max) * sxm * (G - 1) / 2.0)))
    nG1 = h // G
    nG2 = OUT // G
    rc = (G - 1) / 2.0

    def rot_params(th):
        hwf = jnp.asarray([h, w], f32)
        return RotWarpParams(
            scale=jnp.asarray([h / OUT, w / OUT], f32),
            origin=jnp.zeros((2,), f32),
            cos_sin=jnp.stack([jnp.cos(th), jnp.sin(th)]),
            center=jnp.asarray([h / 2 - 0.5, w / 2 - 0.5], f32),
            t=jnp.asarray([8.0, -5.0], f32),
            src_lo=jnp.zeros((2,), f32), src_hi=hwf, canvas_hw=hwf,
        )

    def hat_plain(pos, n_in):
        taps = jax.lax.broadcasted_iota(jnp.int32, (n_in,), 0).astype(f32)
        return jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - taps))

    def residual_shift(x, delta, D, axis):
        wgt = jnp.maximum(
            0.0,
            1.0 - jnp.abs(
                jnp.clip(delta, -float(D), float(D))[:, None]
                - jnp.arange(-D, D + 1, dtype=f32)[None, :]),
        )
        if axis == 1:
            pad = jnp.pad(x, ((0, 0), (D, D), (0, 0)))
            acc = jnp.zeros_like(x)
            for j, d in enumerate(range(-D, D + 1)):
                acc = acc + pad[:, D + d: D + d + x.shape[1], :] * (
                    wgt[:, j][:, None, None])
            return acc
        pad = jnp.pad(x, ((D, D), (0, 0), (0, 0)))
        acc = jnp.zeros_like(x)
        for j, d in enumerate(range(-D, D + 1)):
            acc = acc + pad[D + d: D + d + x.shape[0], :, :] * (
                wgt[:, j][None, :, None])
        return acc

    def coeffs(th, seed_scalar):
        # the same affine terms the warp derives; perturbed by
        # seed_scalar so loop iterations cannot CSE
        pp = rot_params(th)
        cth, sth = pp.cos_sin[0], pp.cos_sin[1]
        a_y, a_x = pp.scale[0], pp.scale[1] + seed_scalar * 1e-6
        m00, m01 = cth * a_y, -sth * a_x
        m10, m11 = sth * a_y, cth * a_x
        Ax = m11 - m10 * m01 / m00
        Bx = m10 / m00
        return m00, m01, Ax, Bx

    def gen_hats(th, seed_scalar):
        m00, m01, Ax, Bx = coeffs(th, seed_scalar)
        ycent = jnp.arange(nG1, dtype=f32) * G + rc
        vpos = (Ax * jax.lax.broadcasted_iota(f32, (nG1, OUT), 1)
                + Bx * ycent[:, None])
        k1 = hat_plain(vpos, w)
        vcent = jnp.arange(nG2, dtype=f32) * G + rc
        upos = (m00 * jax.lax.broadcasted_iota(f32, (nG2, OUT), 1)
                + m01 * vcent[:, None])
        k2 = hat_plain(upos, h)
        return k1, k2

    def staged_sum(fn, xs):
        return jnp.sum(jax.lax.map(
            lambda t2: fn(*t2), xs, batch_size=args.chunk))

    def loop(step):
        @jax.jit
        def run(x0):
            def body(i, carry):
                acc, x = carry
                y = step(x, acc)
                return acc + y, x + (y > 0).astype(x.dtype)
            acc, _ = jax.lax.fori_loop(
                0, args.iters, body, (jnp.zeros((), f32), x0))
            return acc
        return run

    def timed(name, run, x0):
        float(run(x0))
        best = np.inf
        for _ in range(args.trials):
            t0 = time.perf_counter()
            v = float(run(x0))
            best = min(best, time.perf_counter() - t0)
            assert np.isfinite(v)
        row = {"stage": name, "batch": b, "iters": args.iters,
               "us_per_img": round(best / (args.iters * b) * 1e6, 1),
               "img_per_s": round(args.iters * b / best, 1)}
        print(json.dumps(row), flush=True)
        return row

    rows = []

    def step_hats(imgs_f, acc):
        def one(img, th):
            k1, k2 = gen_hats(th, acc + jnp.sum(img[:1, :1, 0]) * 0)
            return jnp.sum(k1) + jnp.sum(k2)
        return staged_sum(one, (imgs_f, thetas))

    rows.append(timed("hats", loop(step_hats), imgs))

    def step_resid(imgs_f, acc):
        def one(img, th):
            m00, m01, Ax, Bx = coeffs(th, acc)
            r1 = jnp.tile(jnp.arange(G, dtype=f32) - rc, nG1)
            a = residual_shift(img, Bx * r1, D1, axis=1)
            tmp = a[:, :OUT, :]
            r2 = jnp.tile(jnp.arange(G, dtype=f32) - rc, nG2)
            bshift = residual_shift(tmp, m01 * r2, D2, axis=0)
            return jnp.sum(bshift)
        return staged_sum(one, (imgs_f, thetas))

    rows.append(timed("resid", loop(step_resid), imgs))

    def step_einsums(imgs_f, acc):
        def one(img, th):
            k1, k2 = gen_hats(th, acc)
            tmp = jnp.einsum(
                "grwc,gvw->grvc", img.reshape(nG1, G, w, -1), k1,
                preferred_element_type=f32,
            ).reshape(h, OUT, -1)
            out = jnp.einsum(
                "ygrc,guy->ugrc", tmp.reshape(h, nG2, G, -1), k2,
                preferred_element_type=f32,
            )
            return jnp.sum(out)
        return staged_sum(one, (imgs_f, thetas))

    rows.append(timed("einsums_incl_hats", loop(step_einsums), imgs))

    def step_full(imgs_f, acc):
        def one(img, th):
            p = rot_params(th)._replace(
                t=jnp.asarray([8.0 + acc * 1e-6, -5.0], f32))
            return jnp.sum(warp_image_rotated_2level(
                img, p, (OUT, OUT), theta_max_deg=THETA_MAX, block=G))
        return staged_sum(one, (imgs_f, thetas))

    rows.append(timed("full", loop(step_full), imgs))

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ROT2LEVEL_DECOMP.json")
    with open(out, "w") as f:
        json.dump({"D1": D1, "D2": D2, "block": G, "rows": rows}, f, indent=1)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
