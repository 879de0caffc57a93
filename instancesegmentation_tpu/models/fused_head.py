"""Algebraic fusion of the Segment output head (section 6).

The head is LINEAR: ``bottle6_1`` (ConvTranspose k8 s4 p2, 16->4, ref
model/segment.py:435-438) feeds ``bottle6_2`` (raw Conv 3x3 p1, 4->1)
with no activation in between (segment.py:504-505).  Two linear maps
compose into ONE transposed conv with kernel k=10, stride 4 — which
removes the [H*4, W*4, 4] intermediate (4.2 MB/img at 512 px, the
single largest activation in the net) from HBM entirely.

The composite kernel is derived NUMERICALLY from impulse responses of
the real two-op pipeline (no hand algebra to get flips/phases wrong).

Exactness: the composition is exact everywhere except the outermost
1-px ring of the output, where ``bottle6_2``'s zero padding sees true
zeros in the unfused path but would see out-of-window correlation
values in the composite.  ``head_apply`` therefore recomputes the four
border strips with the original unfused math on 1-row/col input slices
(cheap: the strips only depend on the first/last input row/col) and
adds them as a zero-padded delta — exact in exact arithmetic, and
exact up to ONE f32 rounding on the border ring in practice (the
additive form computes fl(fl(exact - fused) + fused), not ``exact``
itself; the interior is untouched and matches the unfused head
bit-for-bit).  Overwrite with dynamic_update_slice instead if true
bit-exactness of the ring is ever required — measured 2% slower
(ROOFLINE.md: each DUS materialized a full-size copy).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

K1 = 8  # bottle6_1 kernel
S = 4   # bottle6_1 stride
P1 = 2  # bottle6_1 padding
K2 = 3  # bottle6_2 kernel
P2 = 1  # bottle6_2 padding
KC = K1 + K2 - 1  # composite kernel size (10)
PC = K1 - 1 - P1 + K2 - 1 - P2  # composite conv-side padding (6)


class FoldedHead(NamedTuple):
    kernel: jax.Array   # [KC, KC, C_in, 1] conv-ready composite
    phase_kernel: jax.Array  # [3, 3, C_in, S*S] per-output-phase conv
    bias: jax.Array     # scalar interior bias
    k1: jax.Array       # original bottle6_1 kernel [K1,K1,C_in,C_mid]
    b1: jax.Array       # [C_mid]
    k2: jax.Array       # original bottle6_2 kernel [K2,K2,C_mid,1]
    b2: jax.Array       # [1]


def _convt(x, kernel, pad):
    """ConvTranspose as input-dilated conv — same call as
    models/layers.ConvTranspose (kernel stored conv-ready)."""
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        lhs_dilation=(S, S),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _conv(x, kernel, pads):
    """Plain conv with explicit ((t,b),(l,r)) padding."""
    return jax.lax.conv_general_dilated(
        x, kernel,
        window_strides=(1, 1),
        padding=pads,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def fold_head(params: dict) -> FoldedHead:
    """Build the composite head from Segment params (``bottle6_1`` /
    ``bottle6_2``), measuring the kernel via impulse responses."""
    k1 = jnp.asarray(params["bottle6_1"]["kernel"], jnp.float32)
    b1 = jnp.asarray(params["bottle6_1"]["bias"], jnp.float32)
    k2 = jnp.asarray(params["bottle6_2"]["conv"]["kernel"], jnp.float32)
    b2 = jnp.asarray(params["bottle6_2"]["conv"]["bias"], jnp.float32)
    c_in = k1.shape[2]

    # impulse at the center of a canvas large enough that neither the
    # response support nor conv padding reaches the borders
    canvas = 2 * KC  # 20 input px -> 80 output px; response spans 10
    ctr = canvas // 2
    x = jnp.zeros((c_in, canvas, canvas, c_in), jnp.float32)
    x = x.at[jnp.arange(c_in), ctr, ctr, jnp.arange(c_in)].set(1.0)

    y = _convt(x, k1, K1 - 1 - P1)          # no biases: linear part only
    out = _conv(y, k2, ((P2, P2), (P2, P2)))  # [c_in, S*canvas, S*canvas, 1]

    # response g[c, Δy, Δx] around output position S*ctr
    lo = S * ctr - (KC - 1)
    g = jax.lax.dynamic_slice(
        out, (0, lo, lo, 0), (c_in, 2 * KC - 1, 2 * KC - 1, 1)
    )[..., 0]

    # conv-ready composite kernel: out[o] = Σ_i Kc[S*i - o + PC] x[i]
    #   ⇒ Kc[u] = g[PC - u]   (u ∈ 0..KC-1);
    # the g array covers Δ ∈ [-(KC-1) .. KC-1] at index Δ + KC-1
    idx = (PC - jnp.arange(KC)) + (KC - 1)
    kc = g[:, idx][:, :, idx]              # [c_in, KC, KC]
    kernel = jnp.transpose(kc, (1, 2, 0))[..., None]  # [KC, KC, c_in, 1]

    # phase decomposition of the same composite: output pixel
    # (S*u+py, S*v+px) = Σ_t Kc[S*t - p + PC] x[u+t]  (t ∈ {-1,0,1}),
    # i.e. ONE ordinary 3x3 conv with S*S phase output-channels at low
    # res followed by a pixel shuffle — MXU-shaped, unlike the
    # lhs-dilated k10 conv which computes mostly-zero dense taps.
    pk = jnp.zeros((3, 3, c_in, S * S), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            for py in range(S):
                uy = S * (ky - 1) - py + PC
                if not (0 <= uy < KC):
                    continue
                for px in range(S):
                    ux = S * (kx - 1) - px + PC
                    if not (0 <= ux < KC):
                        continue
                    pk = pk.at[ky, kx, :, S * py + px].set(
                        kernel[uy, ux, :, 0]
                    )

    # interior bias: run the real head on zeros, read an interior pixel
    z = jnp.zeros((1, canvas, canvas, c_in), jnp.float32)
    yz = _convt(z, k1, K1 - 1 - P1) + b1
    bias = _conv(yz, k2, ((P2, P2), (P2, P2)))[0, S * ctr, S * ctr, 0] + b2[0]

    return FoldedHead(
        kernel=kernel, phase_kernel=pk, bias=bias, k1=k1, b1=b1, k2=k2, b2=b2
    )


def _border_rows(x_strip, head: FoldedHead, side: str, dtype):
    """Exact first/last P2 output rows from a 1-row input slice.

    ``side``: 'top' or 'bottom'.  The composite is only wrong on the
    P2-px ring where bottle6_2's zero padding bites; output row 0
    depends on y rows -P2..P2, and y rows 0..P2 depend only on x row 0
    (m - S*i + P1 ∈ [0, K1) with m ≤ P2 ⇒ i = 0); symmetric at the
    bottom.  Width is processed in full, so column padding is exact
    here too (including corners).
    """
    k1 = head.k1.astype(dtype)
    k2 = head.k2.astype(dtype)
    y = _convt(x_strip.astype(dtype), k1, K1 - 1 - P1) + head.b1.astype(dtype)
    # 1-row input -> K1 - 2*P1 = 4 rows = y rows 0..3 (top) / -4..-1
    # (bottom); only the outermost P2+1 of those are used.
    if side == "top":
        band = y[:, : P2 + 1]                     # y rows 0..P2
        out = _conv(band, k2, ((P2, 0), (P2, P2))) + head.b2.astype(dtype)
        return out  # [N, P2, S*w, 1]
    band = y[:, -(P2 + 1):]                       # y rows -P2-1..-1
    out = _conv(band, k2, ((0, P2), (P2, P2))) + head.b2.astype(dtype)
    return out


def _border_cols(x_strip, head: FoldedHead, side: str, dtype):
    """Exact first/last P2 output columns, full height."""
    k1 = head.k1.astype(dtype)
    k2 = head.k2.astype(dtype)
    y = _convt(x_strip.astype(dtype), k1, K1 - 1 - P1) + head.b1.astype(dtype)
    if side == "left":
        band = y[:, :, : P2 + 1]
        out = _conv(band, k2, ((P2, P2), (P2, 0))) + head.b2.astype(dtype)
        return out  # [N, S*h, P2, 1]
    band = y[:, :, -(P2 + 1):]
    out = _conv(band, k2, ((P2, P2), (0, P2))) + head.b2.astype(dtype)
    return out


def head_apply(x, head: FoldedHead, dtype: Any = jnp.float32):
    """Composite head forward: ``x [N,h,w,C] -> logits [N,S*h,S*w,1]``.

    Exactly equal (in f32) to ``bottle6_2(bottle6_1(x))``.

    The border ring (outer P2 px, where bottle6_2's zero padding makes
    the composite wrong) is corrected ADDITIVELY: thin exact-minus-
    composite delta strips are zero-padded to full size and added, so
    XLA fuses four pads + one add into the output fusion instead of
    materializing four full-size dynamic-update-slice copies (measured:
    ``.at[].set`` emitted 4x [N,4H,4W,1] buffers, ~2.6 MB/img).
    """
    xd = x.astype(dtype)
    n, h, w, _ = xd.shape
    conv_out = _conv(xd, head.phase_kernel.astype(dtype), ((1, 1), (1, 1)))
    out = (
        conv_out.reshape(n, h, w, S, S)
        .transpose(0, 1, 3, 2, 4)
        .reshape(n, S * h, S * w, 1)
    )
    out = out + head.bias.astype(dtype)
    n, hh, ww, _ = out.shape

    top = _border_rows(x[:, :1], head, "top", dtype)
    bot = _border_rows(x[:, -1:], head, "bottom", dtype)
    # left/right strips exclude the top/bottom P2 rows (those corners
    # are already fully corrected by the row strips)
    left = _border_cols(x[:, :, :1], head, "left", dtype)[:, P2:-P2]
    right = _border_cols(x[:, :, -1:], head, "right", dtype)[:, P2:-P2]

    def pad_to_full(delta, pads_hw):
        (pt, pb), (pl, pr) = pads_hw
        return jnp.pad(delta, ((0, 0), (pt, pb), (pl, pr), (0, 0)))

    corr = (
        pad_to_full(top - out[:, :P2], ((0, hh - P2), (0, 0)))
        + pad_to_full(bot - out[:, -P2:], ((hh - P2, 0), (0, 0)))
        + pad_to_full(
            left - out[:, P2:-P2, :P2], ((P2, P2), (0, ww - P2))
        )
        + pad_to_full(
            right - out[:, P2:-P2, -P2:], ((P2, P2), (ww - P2, 0))
        )
    )
    return out + corr


def fused_apply(model, variables, head: FoldedHead, images, heatmaps=None):
    """Full Segment forward with the folded head: drop-in replacement
    for ``model.apply(variables, images, heatmaps, train=False)``
    (same f32 logits contract, models/segment.py:125)."""
    feats = model.apply(
        variables, images, heatmaps, train=False, truncate_head=True
    )
    return head_apply(feats, head, dtype=model.dtype).astype(jnp.float32)
