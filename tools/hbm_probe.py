"""Empirical HBM traffic probe (VERDICT r2 weak#1 / next#3a).

ROOFLINE.md conclusion 5 proved XLA's ``cost_analysis()`` byte counts
are NOT real HBM traffic (lane-padding bytes the hardware never pays),
so every "% of roofline" column derived from them is suspect.  This
tool replaces the cost model with MEASUREMENT:

1. ``--mode bandwidth``: the chip's achievable HBM bandwidth, measured
   with the same chained in-graph fori_loop methodology as bench.py
   (the only timing the axon tunnel cannot distort): each iteration
   streams a large array through an elementwise update with a loop
   carry, so one pass = one read + one write of the whole array, and
   XLA can neither hoist nor fuse iterations.  Arrays are far larger
   than VMEM (16 MB), so every pass hits HBM.

2. ``--mode implied``: times the batch-128 fused serving program
   (bench.py's headline body) and converts time -> implied bytes at the
   measured achievable bandwidth.  If the program were perfectly
   memory-bound at the streaming rate, it would move exactly this many
   bytes; compared against two analytic floors it brackets the real
   fusion headroom WITHOUT trusting the compiler's byte accounting:

   - conv-floor: every conv/pool reads its input once and writes its
     output once in bf16 (elementwise ops fused away, weights ~0.5 MB
     amortized over the batch).  This is the floor XLA's fusion model
     can reach without cross-conv fusion.
   - absolute floor: program input (u8 image) + final output read/
     written exactly once — reachable only by whole-net fusion.

   headroom = implied_bytes / conv_floor.  <=1.1 means the program is
   within ~10% of everything the XLA fusion model can remove, and
   further gains require cross-conv fusion (the fused_chain route).

3. ``--mode profile``: attempts a real ``jax.profiler`` device trace
   around the serving program (the VERDICT-preferred evidence).  On the
   axon remote tunnel the device runs out-of-process, so this may
   capture host-only data; the tool reports what it finds rather than
   pretending.

Usage: python tools/hbm_probe.py --mode bandwidth|implied|profile
Writes HBM_PROBE.json fragments to stdout (one JSON line per mode).
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
    """Value-forced warmup (pays remote compile), then one timed run."""
    float(fn(*args))
    t0 = time.perf_counter()
    checksum = float(fn(*args))
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)
    return dt


def measure_bandwidth(mb: int = 2048, iters: int = 20) -> dict:
    """Achievable HBM stream bandwidth: fori_loop of x <- x*a+b over a
    ``mb``-MB f32 array; one iteration = read N + write N bytes.

    The array is created ON DEVICE (jit'd ones) — device_put through the
    axon tunnel uploads at ~60 MB/s and would dominate.  Measured sweep
    (this chip): 256 MB -> 381 GB/s, 1 GB -> 407, 2 GB -> 479; the
    asymptote is ~500 GB/s with a ~0.3 ms fixed per-dispatch overhead,
    so the default is the largest size that fits comfortably."""
    import jax
    import jax.numpy as jnp

    n = mb * 1024 * 1024 // 4
    x = jax.jit(lambda: jnp.ones((n,), jnp.float32))()

    @jax.jit
    def loop(x):
        def body(i, x):
            # multiply-add keeps the value bounded and the chain
            # un-foldable (carry dependency)
            return x * jnp.float32(0.999999) + jnp.float32(1e-6)

        return jnp.sum(jax.lax.fori_loop(0, iters, body, x)[:1])

    dt = _timed(loop, x)
    bytes_moved = 2 * n * 4 * iters
    gbps = bytes_moved / dt / 1e9
    return {
        "mode": "bandwidth",
        "array_mb": mb,
        "iters": iters,
        "seconds": round(dt, 4),
        "achieved_gb_per_s": round(gbps, 1),
        "spec_gb_per_s": 819,
        "fraction_of_spec": round(gbps / 819, 3),
    }


# per-conv activation table for the truncated+folded serving net at
# 512x512 input, C_in=3 (SURVEY.md §2.6 topology; bytes are bf16
# activations, in-read + out-write per conv/pool, elementwise fused).
# Format: (name, H_in, C_in, H_out, C_out).  Residual adds re-read the
# saved tensor: counted as an extra read entry (C_out at H_out).
def conv_floor_by_span(size: int = 512) -> dict:
    """Per-span conv-floor bytes: {span_name: bytes}.  Spans match
    ``measure_spans`` exactly (stem / s1 / s2s3 / dec / head)."""
    s = size
    t = []  # (span, H_in, C_in, H_out, C_out)
    cur_span = ["stem"]

    def span(name):
        cur_span[0] = name

    def conv(h_in, c_in, h_out, c_out):
        t.append((cur_span[0], h_in, c_in, h_out, c_out))

    def extra_read(h, c):
        t.append((cur_span[0], h, c, 0, 0))

    # init_head_s4: two k5s2 convs + maxpool4 (input re-read) + concat
    conv(s, 3, s // 2, 16)
    conv(s // 2, 16, s // 4, 16)
    conv(s, 3, s // 4, 3)            # maxpool4 (read input again)
    # concat 16+3 -> 19 assumed fused into the consumer reads
    # bottle1_1 BottleneckDown2 19->48 at /8 (+ pooled shortcut 1x1)
    span("s1")
    conv(s // 4, 19, s // 8, 48)
    conv(s // 4, 19, s // 8, 19)     # maxpool2
    conv(s // 8, 19, s // 8, 48)     # 1x1 projection
    extra_read(s // 8, 48)           # add
    # 4x Bottleneck3x3(48,16) at /8
    for _ in range(4):
        conv(s // 8, 48, s // 8, 16)
        conv(s // 8, 16, s // 8, 16)
        conv(s // 8, 16, s // 8, 48)
        extra_read(s // 8, 48)       # residual re-read
    # bottle2_1 Down2 48->128 at /16
    span("s2s3")
    conv(s // 8, 48, s // 16, 128)
    conv(s // 8, 48, s // 16, 48)
    conv(s // 16, 48, s // 16, 128)
    extra_read(s // 16, 128)
    # section 2: 4x B3x3(128,48) + B5x5
    for _ in range(4):
        conv(s // 16, 128, s // 16, 48)
        conv(s // 16, 48, s // 16, 48)
        conv(s // 16, 48, s // 16, 128)
        extra_read(s // 16, 128)
    conv(s // 16, 128, s // 16, 48)
    conv(s // 16, 48, s // 16, 48)   # (5,1)
    conv(s // 16, 48, s // 16, 48)   # (1,5)
    conv(s // 16, 48, s // 16, 128)
    extra_read(s // 16, 128)
    # cat2 -> 256; bottle3_1 DimRes(256->128) with projection
    conv(s // 16, 256, s // 16, 48)
    conv(s // 16, 48, s // 16, 48)
    conv(s // 16, 48, s // 16, 128)
    conv(s // 16, 256, s // 16, 128)  # resconv projection
    extra_read(s // 16, 128)
    # section 3: 4x B3x3(128,48) + B5x5
    for _ in range(4):
        conv(s // 16, 128, s // 16, 48)
        conv(s // 16, 48, s // 16, 48)
        conv(s // 16, 48, s // 16, 128)
        extra_read(s // 16, 128)
    conv(s // 16, 128, s // 16, 48)
    conv(s // 16, 48, s // 16, 48)
    conv(s // 16, 48, s // 16, 48)
    conv(s // 16, 48, s // 16, 128)
    extra_read(s // 16, 128)
    # bottle4_1 UpRes(128->48) at /8 (conv-before-upsample form) +
    # skip path reads pooled(48ch at /16 -> upsample) and merges
    span("dec")
    conv(s // 16, 128, s // 16, 16)
    conv(s // 16, 16, s // 8, 48)    # convtranspose k4s2
    conv(s // 16, 128 + 128, s // 16, 48)  # skip 1x1 over concat(res, pool)
    extra_read(s // 8, 48)           # upsampled skip add
    # cat1(48+48=96); bottle4_2 DimRes(96->48); bottle4_3 Dim(48)
    conv(s // 8, 96, s // 8, 16)
    conv(s // 8, 16, s // 8, 16)
    conv(s // 8, 16, s // 8, 48)
    conv(s // 8, 96, s // 8, 48)     # resconv
    extra_read(s // 8, 48)
    conv(s // 8, 48, s // 8, 16)
    conv(s // 8, 16, s // 8, 16)     # dense middle (usePrelu=False)
    conv(s // 8, 16, s // 8, 48)
    extra_read(s // 8, 48)
    # bottle5_1 UpResOther(48->16) at /4 + skip over (48+19)
    conv(s // 8, 48, s // 8, 4)
    conv(s // 8, 4, s // 4, 16)
    conv(s // 8, 48 + 19, s // 8, 16)
    extra_read(s // 4, 16)
    # bottle5_2 Dim(16)
    conv(s // 4, 16, s // 4, 4)
    conv(s // 4, 4, s // 4, 4)
    conv(s // 4, 4, s // 4, 16)
    extra_read(s // 4, 16)
    # folded head: phase conv 16 -> 16 phases at /4 + pixel shuffle
    span("head")
    conv(s // 4, 16, s // 4, 16)
    conv(s // 4, 16, s, 1)           # pixel shuffle write at /1

    out: dict = {}
    for name, h_in, c_in, h_out, c_out in t:
        out[name] = out.get(name, 0) + (
            h_in * h_in * c_in * 2 + h_out * h_out * c_out * 2
        )
    return out


def conv_floor_bytes(size: int = 512) -> int:
    return sum(conv_floor_by_span(size).values())


def absolute_floor_bytes(size: int = 512) -> int:
    # u8 input read + f32 sigmoid output write (bench body keeps probs
    # in bf16; count bf16)
    return size * size * 3 * 1 + size * size * 1 * 2


def _build_serving_loop(batch_size: int, size: int, iters: int):
    import jax
    import jax.numpy as jnp

    from instancesegmentation_tpu.models.fused_head import fold_head, head_apply
    from instancesegmentation_tpu.models.segment import Segment

    model = Segment(in_channels=3, dtype=jnp.bfloat16)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), train=False
    )
    head = fold_head(variables["params"])

    @jax.jit
    def loop(images_u8):
        def body(i, carry):
            acc, img = carry
            x = img.astype(jnp.bfloat16) * jnp.bfloat16(1 / 127.5) - 1.0
            feats = model.apply(variables, x, train=False, truncate_head=True)
            probs = jax.nn.sigmoid(head_apply(feats, head, dtype=jnp.bfloat16))
            acc = acc + jnp.sum(probs)
            bump = (probs[:, :1, :1, 0] > 0.5).astype(jnp.uint8)
            img = img.at[:, :1, :1, 0].add(bump)
            return acc, img

        acc, _ = jax.lax.fori_loop(
            0, iters, body, (jnp.zeros((), jnp.float32), images_u8)
        )
        return acc

    rng = np.random.default_rng(0)
    batch = jax.device_put(
        jnp.asarray(
            rng.integers(0, 255, size=(batch_size, size, size, 3), dtype=np.uint8)
        )
    )
    return loop, batch


def measure_implied(size: int = 512, batch: int = 128, iters: int = 30) -> dict:
    bw = measure_bandwidth()
    loop, images = _build_serving_loop(batch, size, iters)
    dt = _timed(loop, images)
    t_img = dt / (batch * iters)
    implied = t_img * bw["achieved_gb_per_s"] * 1e9
    floor = conv_floor_bytes(size)
    return {
        "mode": "implied",
        "batch": batch,
        "images_per_sec": round(batch * iters / dt, 1),
        "achieved_hbm_gb_per_s": bw["achieved_gb_per_s"],
        "implied_bytes_per_img_mb": round(implied / 1e6, 2),
        "conv_floor_mb": round(floor / 1e6, 2),
        "absolute_floor_mb": round(absolute_floor_bytes(size) / 1e6, 3),
        "headroom_vs_conv_floor": round(implied / floor, 3),
        "note": "implied = time x achieved-BW upper-bounds real traffic "
                "iff memory-bound; headroom <= this ratio",
    }


def _span_models(size: int):
    """Flax wrappers for the five serving spans, with input shapes.

    Boundaries match ``conv_floor_by_span``: stem (u8 image -> /4
    feature), s1 (/4 -> /8), s2s3 (/8 -> /16, incl. cat2), dec
    (/16 + skips -> /4 16ch), head (folded section 6 + sigmoid).
    """
    import jax.numpy as jnp
    from flax import linen as nn

    from instancesegmentation_tpu.models.layers import (
        Bottleneck3x3,
        Bottleneck5x5,
        BottleneckDim,
        BottleneckDimRes,
        BottleneckDown2,
        BottleneckUpRes,
        InitHeadS4,
    )

    kw = dict(dtype=jnp.bfloat16)
    s = size

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, img_u8):
            x = img_u8.astype(jnp.bfloat16) * jnp.bfloat16(1 / 127.5) - 1.0
            return InitHeadS4(planes=16, name="init_conv", **kw)(x, False)

    class S1(nn.Module):
        @nn.compact
        def __call__(self, x):
            y, pool = BottleneckDown2(16, 48, name="bottle1_1", **kw)(x, False)
            for i in range(4):
                y = Bottleneck3x3(16, name=f"bottle1_x_{i}", **kw)(y, False)
            # pool is a decoder skip; return its corner so it is live
            return y, pool[:, :1, :1, :]

    class S23(nn.Module):
        @nn.compact
        def __call__(self, x):
            b2_down, b2_pool = BottleneckDown2(16, 128, name="bottle2_1", **kw)(x, False)
            y = Bottleneck3x3(48, name="bottle2_x_0", **kw)(b2_down, False)
            y = Bottleneck3x3(48, dilation=2, name="bottle2_x_1", **kw)(y, False)
            y = Bottleneck3x3(48, name="bottle2_x_2", **kw)(y, False)
            y = Bottleneck3x3(48, dilation=4, name="bottle2_x_3", **kw)(y, False)
            y = Bottleneck5x5(48, name="bottle2_x_4", **kw)(y, False)
            cat2 = jnp.concatenate([y, b2_down], axis=-1)
            y = BottleneckDimRes(48, 128, use_prelu=True, name="bottle3_1", **kw)(cat2, False)
            y = Bottleneck3x3(48, name="bottle3_x_0", **kw)(y, False)
            y = Bottleneck3x3(48, dilation=2, name="bottle3_x_1", **kw)(y, False)
            y = Bottleneck3x3(48, name="bottle3_x_2", **kw)(y, False)
            y = Bottleneck3x3(48, dilation=4, name="bottle3_x_3", **kw)(y, False)
            y = Bottleneck5x5(48, name="bottle3_x_4", **kw)(y, False)
            return y, b2_pool[:, :1, :1, :]

    class Dec(nn.Module):
        @nn.compact
        def __call__(self, b3_8, b2_pool, b1_down, b1_pool):
            y = BottleneckUpRes(16, 48, skip_channels=48, name="bottle4_1up", **kw)(
                b3_8, b2_pool, False
            )
            cat1 = jnp.concatenate([b1_down, y], axis=-1)
            y = BottleneckDimRes(16, 48, use_prelu=False, name="bottle4_2", **kw)(cat1, False)
            y = BottleneckDim(16, 48, use_prelu=False, name="bottle4_3", **kw)(y, False)
            y = BottleneckUpRes(4, 16, skip_channels=19, name="bottle5_1up", **kw)(
                y, b1_pool, False
            )
            return BottleneckDim(4, 16, use_prelu=False, name="bottle5_2", **kw)(y, False)

    u8 = ("uint8",)
    bf = ("bfloat16",)
    return {
        "stem": (Stem(), [((s, s, 3),) + u8]),
        "s1": (S1(), [((s // 4, s // 4, 19),) + bf]),
        "s2s3": (S23(), [((s // 8, s // 8, 48),) + bf]),
        "dec": (
            Dec(),
            [
                ((s // 16, s // 16, 128),) + bf,
                ((s // 16, s // 16, 48),) + bf,
                ((s // 8, s // 8, 48),) + bf,
                ((s // 8, s // 8, 19),) + bf,  # b1_pool = maxpool2(init /4)
            ],
        ),
    }


def measure_spans(
    size: int = 512, batch: int = 128, iters: int = 30,
    bw_gbps: float | None = None,
) -> dict:
    """Time each serving span with the fori_loop methodology and report
    us/img, implied MB/img at the measured stream bandwidth, and the
    per-span conv floor.  The 'head' span is measured as (full - sum of
    truncated spans is NOT valid); instead it times fold_head apply
    standalone on the /4 feature."""
    import jax
    import jax.numpy as jnp

    if bw_gbps is None:
        bw_gbps = measure_bandwidth()["achieved_gb_per_s"]

    floors = conv_floor_by_span(size)
    rng = np.random.default_rng(0)
    results = {}

    def time_span(name, model, in_shapes):
        inputs = []
        for shp, dt in in_shapes:
            if dt == "uint8":
                a = rng.integers(0, 255, size=(batch,) + shp, dtype=np.uint8)
                inputs.append(jax.device_put(jnp.asarray(a)))
            else:
                a = rng.normal(size=(batch,) + shp).astype(np.float32)
                inputs.append(jax.device_put(jnp.asarray(a, jnp.bfloat16)))
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), *inputs)

        @jax.jit
        def loop(*ins):
            def body(i, carry):
                acc, x0, rest = carry
                out = model.apply(variables, x0, *rest)
                main = out[0] if isinstance(out, tuple) else out
                acc = acc + jnp.sum(main[:1, :1].astype(jnp.float32))
                bump = (acc > jnp.float32(1e30)).astype(x0.dtype)
                x0 = x0.at[(0,) * x0.ndim].add(bump)
                return acc, x0, rest

            acc, _, _ = jax.lax.fori_loop(
                0, iters, body, (jnp.zeros((), jnp.float32), ins[0], ins[1:])
            )
            return acc

        dt = _timed(loop, *inputs)
        us_img = dt / (batch * iters) * 1e6
        implied_mb = us_img * 1e-6 * bw_gbps * 1e9 / 1e6
        floor_mb = floors.get(name, 0) / 1e6
        results[name] = {
            "us_per_img": round(us_img, 2),
            "implied_mb_per_img": round(implied_mb, 2),
            "conv_floor_mb": round(floor_mb, 2),
            "implied_over_floor": round(implied_mb / floor_mb, 2) if floor_mb else None,
        }

    for name, (model, in_shapes) in _span_models(size).items():
        time_span(name, model, in_shapes)

    # head span: folded section-6 head + sigmoid on the /4 feature
    from instancesegmentation_tpu.models.fused_head import fold_head, head_apply
    from instancesegmentation_tpu.models.segment import Segment

    seg = Segment(in_channels=3, dtype=jnp.bfloat16)
    variables = jax.jit(seg.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), train=False
    )
    head = fold_head(variables["params"])
    feat = jax.device_put(
        jnp.asarray(
            rng.normal(size=(batch, size // 4, size // 4, 16)).astype(np.float32),
            jnp.bfloat16,
        )
    )

    @jax.jit
    def head_loop(x0):
        def body(i, carry):
            acc, x = carry
            probs = jax.nn.sigmoid(head_apply(x, head, dtype=jnp.bfloat16))
            acc = acc + jnp.sum(probs[:1, :1].astype(jnp.float32))
            bump = (acc > jnp.float32(1e30)).astype(x.dtype)
            return acc, x.at[0, 0, 0, 0].add(bump)

        return jax.lax.fori_loop(0, iters, body, (jnp.zeros((), jnp.float32), x0))[0]

    dt = _timed(head_loop, feat)
    us_img = dt / (batch * iters) * 1e6
    floor_mb = floors["head"] / 1e6
    implied_mb = us_img * 1e-6 * bw_gbps * 1e9 / 1e6
    results["head"] = {
        "us_per_img": round(us_img, 2),
        "implied_mb_per_img": round(implied_mb, 2),
        "conv_floor_mb": round(floor_mb, 2),
        "implied_over_floor": round(implied_mb / floor_mb, 2),
    }

    total_us = sum(r["us_per_img"] for r in results.values())
    return {
        "mode": "spans",
        "size": size,
        "batch": batch,
        "bw_gbps": bw_gbps,
        "spans": results,
        "sum_us_per_img": round(total_us, 2),
        "sum_img_per_s": round(1e6 / total_us, 1),
        "note": "per-span fori_loop timing; sum excludes cross-span "
                "fusion so it upper-bounds the full program",
    }


def try_profile(size: int = 512, batch: int = 128, out: str = "/tmp/jax_trace") -> dict:
    import glob
    import os

    import jax

    loop, images = _build_serving_loop(batch, size, 5)
    float(loop(images))  # compile outside the trace
    try:
        jax.profiler.start_trace(out)
        float(loop(images))
        jax.profiler.stop_trace()
    except Exception as e:  # tunnel may not support device tracing
        return {"mode": "profile", "ok": False, "error": repr(e)}
    files = glob.glob(os.path.join(out, "**", "*"), recursive=True)
    planes = [f for f in files if f.endswith(".xplane.pb")]
    sizes = {os.path.basename(f): os.path.getsize(f) for f in planes}
    has_device = False
    for f in planes:
        with open(f, "rb") as fh:
            blob = fh.read()
        # device planes are named '/device:TPU:0'-style inside the proto
        if b"TPU" in blob:
            has_device = True
    return {
        "mode": "profile",
        "ok": True,
        "trace_dir": out,
        "xplane_files": sizes,
        "contains_tpu_plane": has_device,
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", default="implied",
                   choices=["bandwidth", "implied", "profile", "floor", "spans"])
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--mb", type=int, default=2048)
    p.add_argument("--bw", type=float, default=None,
                   help="skip the bandwidth re-measure and use this GB/s")
    args = p.parse_args(argv)
    if args.mode == "bandwidth":
        out = measure_bandwidth(args.mb)
    elif args.mode == "implied":
        out = measure_implied(args.size, args.batch)
    elif args.mode == "spans":
        out = measure_spans(args.size, args.batch, bw_gbps=args.bw)
    elif args.mode == "floor":
        spans = conv_floor_by_span(args.size)
        out = {"mode": "floor",
               "conv_floor_mb": round(conv_floor_bytes(args.size) / 1e6, 2),
               "per_span_mb": {k: round(v / 1e6, 2) for k, v in spans.items()},
               "absolute_floor_mb": round(
                   absolute_floor_bytes(args.size) / 1e6, 3)}
    else:
        out = try_profile(args.size, args.batch)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
