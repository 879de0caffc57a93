"""Pallas blocked-hat rotated resampler — the r4-scoped VMEM hat-tile
kernel, measured (VERDICT r4 next#3).

The XLA 2level sampler (ops/warp.warp_image_rotated_2level) runs the
rotated warp at ~117 µs/img (ROT_TIME_PROBE.json warp128_2level); its
hat tensors ([nG1,480,640] + [nG2,480,640] f32 per sample) and the
blocked einsum operands stream through HBM.  This kernel pair executes
the SAME two-level math (blocked hats + banded residual shift) with
every hat tile generated in VMEM on the VPU and contracted immediately
on the MXU — per grid program one (sample, block):

  pass 1: grid (B, nG1): img row-block [C, G, w] -> residual shift
          (static scratch slices) -> [G, w] @ [w, out_w] dot -> tmp
  pass 2: grid (B, nG2): tmp col-block [C, h, G] -> residual shift ->
          [out_h, h] @ [h, G] dot -> out

so the only HBM traffic is img + tmp + out.  Channel-major [B, C, ...]
layout keeps every load/dot/store a contiguous 2-D tile (Mosaic on
this tunnel rejects 3-D reshapes; same discipline as
ops/roi_align.py).  The NHWC<->NCHW transposes are charged to the
kernel in the end-to-end timing — they are part of the deal.

Usage:
  python tools/rot_pallas_probe.py --check          # CPU interpret
  python tools/rot_pallas_probe.py --iters 5        # chip timing
Writes ROT_PALLAS_PROBE.json (timing mode).
"""
from __future__ import annotations

import argparse
import functools
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
THETA_MAX_DEG = 25.0


def _coeffs(params):
    """The 2level affine terms (ops/warp.py), per sample, as one [14]
    f32 vector for the scalar-prefetch channel."""
    import jax.numpy as jnp

    cth, sth = params.cos_sin[0], params.cos_sin[1]
    a_y, a_x = params.scale[0], params.scale[1]
    b_y = 0.5 * a_y - 0.5 + params.origin[0]
    b_x = 0.5 * a_x - 0.5 + params.origin[1]
    cy, cx = params.center[0], params.center[1]
    m00, m01 = cth * a_y, -sth * a_x
    m10, m11 = sth * a_y, cth * a_x
    ky0 = cy + cth * (b_y - cy) - sth * (b_x - cx) - params.t[0]
    kx0 = cx + sth * (b_y - cy) + cth * (b_x - cx) - params.t[1]
    Ax = m11 - m10 * m01 / m00
    Bx = m10 / m00
    Cx = kx0 - m10 * ky0 / m00
    return jnp.stack([
        Ax, Bx, Cx,
        jnp.maximum(0.0, params.src_lo[1]), params.src_hi[1],   # x cut
        m00, m01, ky0,
        jnp.maximum(0.0, params.src_lo[0]), params.src_hi[0],   # y cut
        a_y, b_y, a_x, b_x,                                     # rot cut
    ])


def warp_2level_pallas(img_cm, coefs, out_hw, theta_max_deg, block=G,
                       scale_x_max=None, hat_dtype=None, interpret=False):
    """img_cm [B, C, h, w] (channel-major) + coefs [B, 14] -> [B, C,
    out_h, out_w] f32.  Same math as ops/warp.warp_image_rotated_2level
    (incl. the rotation cut), hats generated in VMEM per block."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    B, C, h, w = img_cm.shape
    out_h, out_w = out_hw
    assert h % block == 0 and out_w % block == 0, (h, out_w, block)
    nG1 = h // block
    nG2 = out_w // block
    rc = (block - 1) / 2.0
    if scale_x_max is None:
        scale_x_max = (w + 2 * 24) / out_w
    t_max = math.radians(abs(theta_max_deg))
    D1 = max(1, int(math.ceil(math.tan(t_max) * (block - 1) / 2.0)))
    D2 = max(1, int(math.ceil(
        math.sin(t_max) * float(scale_x_max) * (block - 1) / 2.0)))
    mid = hat_dtype or img_cm.dtype  # tmp dtype

    def iota2(shape, axis):
        return jax.lax.broadcasted_iota(jnp.int32, shape, axis).astype(f32)

    def pass1_kernel(coef_ref, img_ref, tmp_ref, scratch):
        b = pl.program_id(0)
        g = pl.program_id(1)
        Ax, Bx, Cx = coef_ref[b, 0], coef_ref[b, 1], coef_ref[b, 2]
        lox = coef_ref[b, 3]
        hix = jnp.minimum(coef_ref[b, 4], f32(w))
        ycent = g.astype(f32) * block + rc
        # hat tile [w, out_w]: tap rows, output-column cols
        tap = iota2((w, out_w), 0)
        vv = iota2((w, out_w), 1)
        pos = Ax * vv + (Bx * ycent + Cx)
        k1t = jnp.maximum(0.0, 1.0 - jnp.abs(pos - tap))
        k1t = k1t * ((tap >= lox) & (tap < hix)).astype(f32)
        # residual lerp weights [block, 2*D1+1]
        rr = iota2((block, 2 * D1 + 1), 0) - rc
        dd = iota2((block, 2 * D1 + 1), 1) - D1
        delta = jnp.clip(Bx * rr, -float(D1), float(D1))
        wgt = jnp.maximum(0.0, 1.0 - jnp.abs(delta - dd))
        for ch in range(C):
            rows = img_ref[0, ch].astype(f32)            # [block, w]
            scratch[:, :] = jnp.zeros((block, w + 2 * D1), f32)
            scratch[:, D1:D1 + w] = rows
            acc = jnp.zeros((block, w), f32)
            for j in range(2 * D1 + 1):
                acc = acc + scratch[:, j:j + w] * wgt[:, j][:, None]
            tmp_ref[0, ch] = jax.lax.dot_general(
                acc, k1t, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            ).astype(mid)                                # [block, out_w]

    def pass2_kernel(coef_ref, tmpt_ref, out_ref, scratch):
        # Transposed orientation (v in sublanes, y/u in lanes): Mosaic
        # requires the LANE dim of every block to be 128-divisible or
        # the full array dim, so the 16-wide v block must live in
        # sublanes.  Structurally a clone of pass1 (same proven static
        # lane-slice scratch pattern).
        b = pl.program_id(0)
        g = pl.program_id(1)
        m00, m01, ky0 = coef_ref[b, 5], coef_ref[b, 6], coef_ref[b, 7]
        loy = coef_ref[b, 8]
        hiy = jnp.minimum(coef_ref[b, 9], f32(h))
        a_y, b_y = coef_ref[b, 10], coef_ref[b, 11]
        a_x, b_x = coef_ref[b, 12], coef_ref[b, 13]
        vcent = g.astype(f32) * block + rc
        # hat tile TRANSPOSED [h, out_h]: tap rows (y), output cols (u)
        tap = iota2((h, out_h), 0)
        uu = iota2((h, out_h), 1)
        pos = m00 * uu + (m01 * vcent + ky0)
        k2t = jnp.maximum(0.0, 1.0 - jnp.abs(pos - tap))
        k2t = k2t * ((tap >= loy) & (tap < hiy)).astype(f32)
        # rotation cut [block, out_h]: rows via a_x (v), cols via a_y (u)
        vva = iota2((block, out_h), 0) + vcent - rc
        pxv = a_x * vva + b_x
        pyu = a_y * iota2((block, out_h), 1) + b_y
        cut = ((pyu >= 0) & (pyu < f32(h)) & (pxv >= 0)
               & (pxv < f32(w))).astype(f32)
        # residual weights [block, 2*D2+1] (per row of this block)
        rr = iota2((block, 2 * D2 + 1), 0) - rc
        dd = iota2((block, 2 * D2 + 1), 1) - D2
        delta = jnp.clip(m01 * rr, -float(D2), float(D2))
        wgt = jnp.maximum(0.0, 1.0 - jnp.abs(delta - dd))
        for ch in range(C):
            rows = tmpt_ref[0, ch].astype(f32)           # [block, h]
            scratch[:, :] = jnp.zeros((block, h + 2 * D2), f32)
            scratch[:, D2:D2 + h] = rows
            acc = jnp.zeros((block, h), f32)
            for j in range(2 * D2 + 1):
                acc = acc + scratch[:, j:j + h] * wgt[:, j][:, None]
            out_ref[0, ch] = jax.lax.dot_general(
                acc, k2t, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            ) * cut                                      # [block, out_h]

    tmp = pl.pallas_call(
        pass1_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nG1),
            in_specs=[pl.BlockSpec(
                (1, C, block, w), lambda b, g, c_ref: (b, 0, g, 0))],
            out_specs=pl.BlockSpec(
                (1, C, block, out_w), lambda b, g, c_ref: (b, 0, g, 0)),
            scratch_shapes=[pltpu.VMEM((block, w + 2 * D1), f32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, C, h, out_w), mid),
        interpret=interpret,
    )(coefs.astype(f32), img_cm)

    # v blocks must be SUBLANE blocks (see pass2_kernel): hand pass 2
    # the transposed tmp and transpose its output back.  Both
    # transposes are XLA ops charged to the kernel's end-to-end time.
    tmpt = jnp.swapaxes(tmp, 2, 3)                       # [B, C, out_w, h]
    out_t = pl.pallas_call(
        pass2_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, nG2),
            in_specs=[pl.BlockSpec(
                (1, C, block, h), lambda b, g, c_ref: (b, 0, g, 0))],
            out_specs=pl.BlockSpec(
                (1, C, block, out_h), lambda b, g, c_ref: (b, 0, g, 0)),
            scratch_shapes=[pltpu.VMEM((block, h + 2 * D2), f32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, C, out_w, out_h), f32),
        interpret=interpret,
    )(coefs.astype(f32), tmpt)
    return jnp.swapaxes(out_t, 2, 3)                     # [B, C, out_h, out_w]


def warp_2level_pallas_fused(img_cm, coefs, out_hw, theta_max_deg,
                             block=G, scale_x_max=None, interpret=False):
    """ONE kernel per sample (grid (B,)): both 2level passes with tmp
    held in VMEM scratch, so HBM traffic is img in + out out only
    (~7 MB/sample at 640->480x4ch vs the two-kernel form's extra tmp
    round-trip + transposes).  Slice discipline: pass 1 runs as a
    fori_loop with DYNAMIC SUBLANE offsets (allowed); pass 2 is
    python-unrolled so its 16-wide lane slices stay STATIC (dynamic
    lane indexing is rejected by Mosaic on this tunnel).  Hats are
    generated once per block and shared across channels."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    B, C, h, w = img_cm.shape
    out_h, out_w = out_hw
    assert h % block == 0 and out_w % block == 0, (h, out_w, block)
    nG1 = h // block
    nG2 = out_w // block
    rc = (block - 1) / 2.0
    if scale_x_max is None:
        scale_x_max = (w + 2 * 24) / out_w
    t_max = math.radians(abs(theta_max_deg))
    D1 = max(1, int(math.ceil(math.tan(t_max) * (block - 1) / 2.0)))
    D2 = max(1, int(math.ceil(
        math.sin(t_max) * float(scale_x_max) * (block - 1) / 2.0)))

    def iota2(shape, axis):
        return jax.lax.broadcasted_iota(jnp.int32, shape, axis).astype(f32)

    def kernel(coef_ref, img_ref, out_ref, tmp_scr, pad1, pad2):
        b = pl.program_id(0)
        Ax, Bx, Cx = coef_ref[b, 0], coef_ref[b, 1], coef_ref[b, 2]
        lox = coef_ref[b, 3]
        hix = jnp.minimum(coef_ref[b, 4], f32(w))
        m00, m01, ky0 = coef_ref[b, 5], coef_ref[b, 6], coef_ref[b, 7]
        loy = coef_ref[b, 8]
        hiy = jnp.minimum(coef_ref[b, 9], f32(h))
        a_y, b_y = coef_ref[b, 10], coef_ref[b, 11]
        a_x, b_x = coef_ref[b, 12], coef_ref[b, 13]

        # pass-1 residual lerp weights [block, 2*D1+1] (shared by g1, ch)
        rr1 = iota2((block, 2 * D1 + 1), 0) - rc
        dd1 = iota2((block, 2 * D1 + 1), 1) - D1
        delta1 = jnp.clip(Bx * rr1, -float(D1), float(D1))
        wgt1 = jnp.maximum(0.0, 1.0 - jnp.abs(delta1 - dd1))
        tap1 = iota2((w, out_w), 0)
        vv1 = iota2((w, out_w), 1)

        def pass1_body(g, _):
            ycent = g.astype(f32) * block + rc
            pos = Ax * vv1 + (Bx * ycent + Cx)
            k1t = jnp.maximum(0.0, 1.0 - jnp.abs(pos - tap1))
            k1t = k1t * ((tap1 >= lox) & (tap1 < hix)).astype(f32)
            for ch in range(C):
                rows = img_ref[0, ch, pl.ds(g * block, block), :]
                rows = rows.astype(f32)                  # [block, w]
                pad1[:, :] = jnp.zeros((block, w + 2 * D1), f32)
                pad1[:, D1:D1 + w] = rows
                acc = jnp.zeros((block, w), f32)
                for j in range(2 * D1 + 1):
                    acc = acc + pad1[:, j:j + w] * wgt1[:, j][:, None]
                tmp_scr[pl.ds(ch * h + g * block, block), :] = (
                    jax.lax.dot_general(
                        acc, k1t, (((1,), (0,)), ((), ())),
                        preferred_element_type=f32))     # [block, out_w]
            return _

        jax.lax.fori_loop(0, nG1, pass1_body, 0)

        # pass-2 residual weights [block, 2*D2+1] (shared by g2, ch)
        rr2 = iota2((block, 2 * D2 + 1), 0) - rc
        dd2 = iota2((block, 2 * D2 + 1), 1) - D2
        delta2 = jnp.clip(m01 * rr2, -float(D2), float(D2))
        wgt2 = jnp.maximum(0.0, 1.0 - jnp.abs(delta2 - dd2))
        uu2 = iota2((out_h, h), 0)
        tap2 = iota2((out_h, h), 1)

        for g in range(nG2):                 # static: lane offsets below
            vcent = g * block + rc
            pos = m00 * uu2 + (m01 * vcent + ky0)
            k2 = jnp.maximum(0.0, 1.0 - jnp.abs(pos - tap2))
            k2 = k2 * ((tap2 >= loy) & (tap2 < hiy)).astype(f32)
            pyu = a_y * iota2((out_h, block), 0) + b_y
            vva = iota2((out_h, block), 1) + f32(g * block)
            pxv = a_x * vva + b_x
            cut = ((pyu >= 0) & (pyu < f32(h)) & (pxv >= 0)
                   & (pxv < f32(w))).astype(f32)
            for ch in range(C):
                cols = tmp_scr[ch * h:ch * h + h,
                               g * block:(g + 1) * block]  # [h, block]
                pad2[:, :] = jnp.zeros((h + 2 * D2, block), f32)
                pad2[D2:D2 + h, :] = cols
                acc = jnp.zeros((h, block), f32)
                for j in range(2 * D2 + 1):
                    acc = acc + pad2[j:j + h, :] * wgt2[:, j][None, :]
                out_ref[0, ch, :, g * block:(g + 1) * block] = (
                    jax.lax.dot_general(
                        k2, acc, (((1,), (0,)), ((), ())),
                        preferred_element_type=f32) * cut)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B,),
            in_specs=[pl.BlockSpec(
                (1, C, h, w), lambda b, c_ref: (b, 0, 0, 0))],
            out_specs=pl.BlockSpec(
                (1, C, out_h, out_w), lambda b, c_ref: (b, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((C * h, out_w), f32),          # tmp (all ch)
                pltpu.VMEM((block, w + 2 * D1), f32),     # pass-1 pad
                pltpu.VMEM((h + 2 * D2, block), f32),     # pass-2 pad
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, C, out_h, out_w), f32),
        # img block + out block + tmp scratch + hats ~19 MB > the 16 MB
        # default scoped-vmem window (v5e has 128 MB physical)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(coefs.astype(f32), img_cm)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--check", action="store_true", help="CPU interpret")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--trials", type=int, default=2)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--impls", nargs="+",
                   default=["pallas", "pallas_fused", "xla_2level"])
    args = p.parse_args(argv)

    import jax

    if args.check:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from instancesegmentation_tpu.ops.warp import (
        RotWarpParams,
        warp_image_rotated_2level,
    )

    f32 = jnp.float32
    h = w = CANVAS

    def rot_params(th):
        hwf = jnp.asarray([h, w], f32)
        return RotWarpParams(
            scale=jnp.asarray([h / OUT, w / OUT], f32),
            origin=jnp.asarray([-16.0, -16.0], f32),
            cos_sin=jnp.stack([jnp.cos(th), jnp.sin(th)]),
            center=jnp.asarray([h / 2 - 0.5, w / 2 - 0.5], f32),
            t=jnp.asarray([8.0, -5.0], f32),
            src_lo=jnp.zeros((2,), f32), src_hi=hwf, canvas_hw=hwf,
        )

    if args.check:
        rng = np.random.default_rng(0)
        ch, cw = 96, 128  # small canvas for interpret speed
        co = 64

        def small_params(th):
            hwf = jnp.asarray([ch, cw], f32)
            return RotWarpParams(
                scale=jnp.asarray([ch / co, cw / co], f32),
                origin=jnp.asarray([-4.0, -4.0], f32),
                cos_sin=jnp.stack([jnp.cos(th), jnp.sin(th)]),
                center=jnp.asarray([ch / 2 - 0.5, cw / 2 - 0.5], f32),
                t=jnp.asarray([3.0, -2.0], f32),
                src_lo=jnp.zeros((2,), f32), src_hi=hwf, canvas_hw=hwf,
            )

        imgs = rng.uniform(0, 255, (2, ch, cw, 4)).astype(np.float32)
        worst = 0.0
        for deg in (0.0, 13.0, -25.0):
            th = jnp.asarray(math.radians(deg))
            pp = small_params(th)
            ref = np.stack([
                np.asarray(warp_image_rotated_2level(
                    jnp.asarray(im), pp, (co, co),
                    theta_max_deg=THETA_MAX_DEG, block=G))
                for im in imgs
            ])
            coefs = jnp.stack([_coeffs(pp)] * 2)
            img_cm = jnp.transpose(jnp.asarray(imgs), (0, 3, 1, 2))
            for label, impl in (("pallas", warp_2level_pallas),
                                ("pallas_fused", warp_2level_pallas_fused)):
                got = np.asarray(impl(
                    img_cm, coefs, (co, co), THETA_MAX_DEG, interpret=True))
                got = np.transpose(got, (0, 2, 3, 1))
                err = float(np.max(np.abs(got - ref)))
                worst = max(worst, err)
                print(f"deg={deg}: max|{label} - xla_2level| = {err:.5f}")
        assert worst < 1e-2, worst
        print("CHECK-OK")
        return 0

    # ---- chip timing: end-to-end incl. NHWC<->NCHW transposes --------
    rng = np.random.default_rng(0)
    b = args.batch
    imgs = jax.device_put(jnp.asarray(
        rng.integers(0, 255, (b, h, w, 4), np.uint8).astype(np.float32)))
    thetas = jnp.linspace(-0.4, 0.4, b)

    def run_pallas(imgs_nhwc):
        pp = jax.vmap(rot_params)(thetas)
        coefs = jax.vmap(lambda i: _coeffs(jax.tree_util.tree_map(
            lambda x: x[i], pp)))(jnp.arange(b))
        img_cm = jnp.transpose(imgs_nhwc.astype(jnp.bfloat16), (0, 3, 1, 2))
        out = warp_2level_pallas(img_cm, coefs, (OUT, OUT), THETA_MAX_DEG)
        return jnp.transpose(out, (0, 2, 3, 1))

    def run_pallas_fused(imgs_nhwc):
        pp = jax.vmap(rot_params)(thetas)
        coefs = jax.vmap(lambda i: _coeffs(jax.tree_util.tree_map(
            lambda x: x[i], pp)))(jnp.arange(b))
        img_cm = jnp.transpose(imgs_nhwc.astype(jnp.bfloat16), (0, 3, 1, 2))
        out = warp_2level_pallas_fused(img_cm, coefs, (OUT, OUT),
                                       THETA_MAX_DEG)
        return jnp.transpose(out, (0, 2, 3, 1))

    def run_xla(imgs_nhwc):
        def one(im, th):
            return warp_image_rotated_2level(
                im, rot_params(th), (OUT, OUT),
                theta_max_deg=THETA_MAX_DEG, block=G)
        return jax.lax.map(lambda t2: one(*t2), (imgs_nhwc, thetas),
                           batch_size=8)

    import jax.numpy as jnp2

    impl_fns = {"pallas": run_pallas, "pallas_fused": run_pallas_fused,
                "xla_2level": run_xla}
    rows = []
    for name in args.impls:
        fn = impl_fns[name]
        @jax.jit
        def loop(x0, fn=fn):
            def body(i, carry):
                acc, x = carry
                y = jnp2.sum(fn(x))
                return acc + y, x + (y > 0).astype(x.dtype)
            acc, _ = jax.lax.fori_loop(
                0, args.iters, body, (jnp2.zeros((), jnp2.float32), x0))
            return acc

        v0 = float(loop(imgs))
        best = np.inf
        for _ in range(args.trials):
            t0 = time.perf_counter()
            v = float(loop(imgs))
            best = min(best, time.perf_counter() - t0)
            assert np.isfinite(v)
        rows.append({
            "impl": name, "batch": b, "iters": args.iters,
            "us_per_img": round(best / (args.iters * b) * 1e6, 1),
            "img_per_s": round(args.iters * b / best, 1),
        })
        print(json.dumps(rows[-1]), flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ROT_PALLAS_PROBE.json")
    merged = {}
    if os.path.exists(out):
        with open(out) as f:
            for r in json.load(f).get("rows", []):
                merged[r["impl"]] = r
    for r in rows:
        merged[r["impl"]] = r
    with open(out, "w") as f:
        json.dump({"block": G, "rows": list(merged.values())}, f, indent=1)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
