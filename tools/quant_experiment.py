"""Measure the int8 PTQ serving program vs bf16 at the headline point.

Builds the exact serving program bench.py line 2 measures (u8 ->
normalize -> truncated backbone -> folded head -> sigmoid) twice: the
bf16 float path and the quantized path (quant_mode='int8' backbone,
float folded head), calibrates scales on the same synthetic batch, and
times both with the chained fori_loop methodology at batch 128 / 512^2.
Also reports the quality proxy (thresholded-mask agreement between the
two paths on a held-out batch).

Decision rule (ROOFLINE.md): the memory-bound program implies ~33
MB/img of traffic; int8 halves conv-to-conv tensors, so a real int8
MXU path should land well under 0.9x.  ~1.0x means XLA:TPU is not
lowering s8 convs usefully on this chip — record the negative.

Usage: python tools/quant_experiment.py [--batch 128] [--size 512]
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
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from instancesegmentation_tpu.models.fused_head import fold_head, head_apply
    from instancesegmentation_tpu.models.quantize import calibrate
    from instancesegmentation_tpu.models.segment import Segment

    b, size = args.batch, args.size
    dt16 = jnp.bfloat16
    rng = np.random.default_rng(0)

    mf = Segment(in_channels=3, dtype=dt16)
    mc = Segment(in_channels=3, dtype=dt16, quant_mode="calibrate")
    mq = Segment(in_channels=3, dtype=dt16, quant_mode="int8")
    # selective variant: int8 only where the gate probe measured a win
    # (spatial non-grouped convs); 1x1/depthwise stay float
    mx = Segment(in_channels=3, dtype=dt16, quant_mode="int8_mxu")
    variables = jax.jit(mf.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), train=False
    )
    head = fold_head(variables["params"])

    batch_u8 = jnp.asarray(
        rng.integers(0, 255, size=(b, size, size, 3), dtype=np.uint8)
    )
    x_cal = batch_u8.astype(jnp.float32) / 127.5 - 1.0
    qvars = calibrate(mc, variables, [x_cal])
    vq = {**variables, "quant": qvars}

    def forward(model, v, images_u8):
        x = images_u8.astype(dt16) * jnp.bfloat16(1 / 127.5) - 1.0
        feats = model.apply(v, x, train=False, truncate_head=True)
        return jax.nn.sigmoid(head_apply(feats, head, dtype=dt16))

    def loop(model, v):
        @jax.jit
        def run(images_u8):
            def body(i, carry):
                acc, img = carry
                probs = forward(model, v, img)
                acc = acc + jnp.sum(probs)
                bump = (probs[:, :1, :1, 0] > 0.5).astype(jnp.uint8)
                img = img.at[:, :1, :1, 0].add(bump)
                return acc, img

            return jax.lax.fori_loop(
                0, args.iters, body, (jnp.zeros((), jnp.float32), images_u8)
            )[0]

        return run

    # quality proxy on a held-out batch
    held = jnp.asarray(
        rng.integers(0, 255, size=(8, size, size, 3), dtype=np.uint8)
    )
    pf = np.asarray(forward(mf, variables, held), np.float32)
    pq = np.asarray(forward(mq, vq, held), np.float32)
    px = np.asarray(forward(mx, vq, held), np.float32)
    agree = float(((pf > 0.5) == (pq > 0.5)).mean())
    mad = float(np.abs(pf - pq).mean())
    agree_x = float(((pf > 0.5) == (px > 0.5)).mean())
    mad_x = float(np.abs(pf - px).mean())

    n = b * args.iters
    t_bf = _timed(loop(mf, variables), batch_u8)
    t_q = _timed(loop(mq, vq), batch_u8)
    t_x = _timed(loop(mx, vq), batch_u8)

    print(json.dumps({
        "batch": b, "size": size,
        "bf16_us_per_img": round(t_bf / n * 1e6, 2),
        "int8_us_per_img": round(t_q / n * 1e6, 2),
        "int8_over_bf16": round(t_q / t_bf, 3),
        "int8_mxu_us_per_img": round(t_x / n * 1e6, 2),
        "int8_mxu_over_bf16": round(t_x / t_bf, 3),
        "bf16_img_per_s": round(n / t_bf, 1),
        "int8_img_per_s": round(n / t_q, 1),
        "int8_mxu_img_per_s": round(n / t_x, 1),
        "mask_agreement": round(agree, 5),
        "mean_abs_prob_delta": round(mad, 5),
        "mask_agreement_mxu": round(agree_x, 5),
        "mean_abs_prob_delta_mxu": round(mad_x, 5),
    }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
