"""Pallas fused inference bottleneck block (experimental).

The Segment net is per-op launch-overhead bound at inference: ~60
small-channel convs each pay fixed dispatch/fusion-boundary cost
(measured: batch amortization alone tripled throughput).  This kernel
fuses one whole ``Bottleneck3x3`` residual block — 1x1-reduce, PReLU,
depthwise 3x3, PReLU, 1x1-expand, residual add, PReLU — into a single
VMEM-resident Pallas program, eliminating five HBM round-trips.

Inference-only: BatchNorms must be pre-folded into the conv weights
(models/export.fold_batchnorm).  Grid is one program per batch image;
the 1x1 convs run on the MXU as [H*W, C] matmuls, the depthwise 3x3 as
nine shifted multiply-adds on the VPU over a halo-padded activation.

Not wired into the model — standalone op with an equivalence test
against the unfused reference computation.  MEASURED OUTCOME (v5e,
bs32 64x64x48, steady state): unfused XLA 819 us/block vs this kernel
874 us/block — XLA's own fusion already wins at this shape because the
one-program-per-image grid serializes work XLA batches across the full
batch.  Kept as documented groundwork: a batch-tiled grid (and/or
fusing MULTIPLE consecutive blocks per program, which XLA cannot do
across its fusion boundaries) is the round-2 direction; the small-batch
dispatch overhead this targets is otherwise addressed by batch
amortization (bench.py runs batch 128).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bottleneck3x3_reference(x, w1, b1, a1, dw, b_dw, a2, w2, b2, a_out):
    """Unfused reference (NHWC, BN already folded into weights).

    x  [N,H,W,C]; w1 [C,P]; dw [3,3,P]; w2 [P,C]; a* are PReLU alphas.
    """
    y = jnp.einsum("nhwc,cp->nhwp", x, w1) + b1
    y = jnp.where(y >= 0, y, a1 * y)
    yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = jnp.zeros_like(y)
    h, w = x.shape[1], x.shape[2]
    for dy in range(3):
        for dx in range(3):
            acc = acc + yp[:, dy : dy + h, dx : dx + w, :] * dw[dy, dx]
    acc = acc + b_dw
    acc = jnp.where(acc >= 0, acc, a2 * acc)
    out = jnp.einsum("nhwp,pc->nhwc", acc, w2) + b2
    out = out + x
    return jnp.where(out >= 0, out, a_out * out)


def bottleneck3x3_fused(
    x, w1, b1, a1, dw, b_dw, a2, w2, b2, a_out, interpret: bool = False
):
    """Pallas-fused version of ``bottleneck3x3_reference``."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, c = x.shape
    p = w1.shape[1]

    def kernel(x_ref, w1_ref, b1_ref, a1_ref, dw_ref, bdw_ref, a2_ref,
               w2_ref, b2_ref, aout_ref, out_ref, y_scratch):
        xb = x_ref[0]  # [H, W, C]
        # 1x1 reduce on the MXU: [H*W, C] @ [C, P]
        y = jax.lax.dot_general(
            xb.reshape(h * w, c), w1_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[...]
        y = jnp.where(y >= 0, y, a1_ref[...] * y)
        y = y.reshape(h, w, p)

        # halo-padded scratch for the depthwise 3x3
        y_scratch[...] = jnp.zeros((h + 2, w + 2, p), jnp.float32)
        y_scratch[1 : h + 1, 1 : w + 1, :] = y

        acc = jnp.zeros((h, w, p), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                acc = acc + y_scratch[dy : dy + h, dx : dx + w, :] * dw_ref[dy, dx]
        acc = acc + bdw_ref[...]
        acc = jnp.where(acc >= 0, acc, a2_ref[...] * acc)

        # 1x1 expand + residual + PReLU
        out = jax.lax.dot_general(
            acc.reshape(h * w, p), w2_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2_ref[...]
        out = out.reshape(h, w, c) + xb
        out_ref[0] = jnp.where(out >= 0, out, aout_ref[...] * out)

    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((c, p), lambda i: (0, 0)),
            pl.BlockSpec((p,), lambda i: (0,)),
            pl.BlockSpec((p,), lambda i: (0,)),
            pl.BlockSpec((3, 3, p), lambda i: (0, 0, 0)),
            pl.BlockSpec((p,), lambda i: (0,)),
            pl.BlockSpec((p,), lambda i: (0,)),
            pl.BlockSpec((p, c), lambda i: (0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h + 2, w + 2, p), jnp.float32)],
        interpret=interpret,
    )(
        x.astype(jnp.float32), w1, b1, a1, dw, b_dw, a2, w2, b2, a_out
    )
