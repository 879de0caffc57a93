"""Space-to-depth re-lowering of the stride-4 stem (``init_head_s4``).

The reference stem (ref model/segment.py:19-31) is two k=5 s=2 convs
(C->16, 16->16) plus a maxpool4 shortcut.  At C in {3, 16} the convs are
lane-poor on TPU (the MXU tiles channels to 128 lanes) and the measured
span probe (HBM_PROBE.json) shows the stem is the one part of the
serving program running materially above its per-conv traffic floor
(1.8x; every interior span is at or below floor).

This module re-lowers each k5 s2 conv EXACTLY as a 3x3 s1 conv over the
2x2 space-to-depth transform of its input:

    out(i,j) = sum_{dy,dx<5} K[dy,dx] . x[2i+dy-2, 2j+dx-2]

with x blocked as X[b, r] = x[2b+r] (r in {0,1}) becomes a 3-tap conv in
block coordinates with ky = dy//2, ry = dy%2:

    out(i,j) = sum_{ky,kx<3} K'[ky,kx] . X[i+ky-1, j+kx-1]
    K'[ky, kx, (ry*2+rx)*C + c, o] = K[2ky+ry, 2kx+rx, c, o]

(the dy=5 row/col, i.e. (ky=2, ry=1), is zero).  Same sums, same
padding (p=2 px == 1 block), so the rewrite is exact in exact
arithmetic; only f32/bf16 reduction-order rounding differs.  This is
the classic TPU space-to-depth trick (e.g. MLPerf ResNet input stage):
channels go 3->12 and 16->64, the stride disappears, and the MXU sees
well-shaped matmuls instead of strided lane-poor ones.

Inference-only: BatchNorm running stats are folded into the conv
kernel/bias (scale = gamma/sqrt(var+eps)), mirroring the reference's
``fuseforward`` intent (ref model/segment.py:47-48); PReLU is applied
as-is.  Built from trained variables like models/fused_head.fold_head.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

BN_EPS = 1e-5  # models/layers.ConvBN epsilon


class FoldedStem(NamedTuple):
    k1: jax.Array  # [3, 3, 4*C_in, 16] s2d conv1 kernel, BN-folded, f32
    b1: jax.Array  # [16]
    a1: jax.Array  # [16] PReLU alpha
    k2: jax.Array  # [3, 3, 64, 16]
    b2: jax.Array  # [16]
    a2: jax.Array  # [16]
    in_channels: int


def space_to_depth(x):
    """[N, H, W, C] -> [N, H/2, W/2, 4C]; channel = (ry*2+rx)*C + c."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def _scatter_s2d_kernel(k5):
    """[5, 5, C, O] k5s2p2 kernel -> equivalent [3, 3, 4C, O] k3s1p1."""
    kh, kw, c, o = k5.shape
    assert (kh, kw) == (5, 5)
    out = jnp.zeros((3, 3, 4 * c, o), k5.dtype)
    for dy in range(5):
        ky, ry = dy // 2, dy % 2
        for dx in range(5):
            kx, rx = dx // 2, dx % 2
            blk = (ry * 2 + rx) * c
            out = out.at[ky, kx, blk:blk + c, :].set(k5[dy, dx])
    return out


def _fold_layer(layer_params, layer_stats):
    """Fold ConvBN inference BN into the conv: returns (k5_folded, bias)."""
    k = jnp.asarray(layer_params["conv"]["kernel"], jnp.float32)
    b = jnp.asarray(layer_params["conv"]["bias"], jnp.float32)
    gamma = jnp.asarray(layer_params["bn"]["scale"], jnp.float32)
    beta = jnp.asarray(layer_params["bn"]["bias"], jnp.float32)
    mean = jnp.asarray(layer_stats["bn"]["mean"], jnp.float32)
    var = jnp.asarray(layer_stats["bn"]["var"], jnp.float32)
    scale = gamma * jax.lax.rsqrt(var + BN_EPS)
    return k * scale, (b - mean) * scale + beta


def fold_stem(variables: dict, name: str = "init_conv") -> FoldedStem:
    """Build the s2d stem from trained Segment variables (params +
    batch_stats), BN running stats folded in."""
    p = variables["params"][name]
    s = variables["batch_stats"][name]
    k1, b1 = _fold_layer(p["layer1"], s["layer1"])
    k2, b2 = _fold_layer(p["layer2"], s["layer2"])
    return FoldedStem(
        k1=_scatter_s2d_kernel(k1),
        b1=b1,
        a1=jnp.asarray(p["layer1"]["act"]["alpha"], jnp.float32),
        k2=_scatter_s2d_kernel(k2),
        b2=b2,
        a2=jnp.asarray(p["layer2"]["act"]["alpha"], jnp.float32),
        in_channels=int(k1.shape[2]),
    )


def _conv3x3(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _prelu(x, alpha):
    return jnp.where(x >= 0, x, alpha * x)


def stem_apply(x, stem: FoldedStem, dtype: Any = jnp.float32):
    """Folded stem forward: ``x [N,H,W,C] -> [N,H/4,W/4,C+16]``.

    Matches ``InitHeadS4`` (models/layers.py:232) inference output up to
    reduction-order rounding: maxpool4 shortcut concatenated before the
    two-conv path (ref model/segment.py:19-31 ordering).
    """
    from instancesegmentation_tpu.models.layers import max_pool

    xd = x.astype(dtype)
    short = max_pool(xd, 4, 4)
    y = _conv3x3(space_to_depth(xd), stem.k1.astype(dtype))
    y = _prelu(y + stem.b1.astype(dtype), stem.a1.astype(dtype))
    y = _conv3x3(space_to_depth(y), stem.k2.astype(dtype))
    y = _prelu(y + stem.b2.astype(dtype), stem.a2.astype(dtype))
    return jnp.concatenate([short, y], axis=-1)
