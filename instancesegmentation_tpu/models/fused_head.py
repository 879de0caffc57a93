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
    row_kernel: jax.Array  # [1, 3, 2*C_in, 2*S] top⊕bottom edge conv1d
    col_kernel: jax.Array  # [3, 1, 2*C_in, 2*S] left⊕right edge conv1d
    bias_rows: jax.Array   # [2, 3] (top/bottom) x (corner_l, interior, corner_r)
    bias_cols: jax.Array   # [2] left/right interior-of-edge bias
    corner_w: jax.Array    # [4, C_in] tl/tr/bl/br corner-pixel weights
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

    row_kernel, col_kernel, bias_rows, bias_cols, corner_w = _edge_maps(
        k1, b1, k2, b2
    )

    return FoldedHead(
        kernel=kernel, phase_kernel=pk, bias=bias,
        row_kernel=row_kernel, col_kernel=col_kernel,
        bias_rows=bias_rows, bias_cols=bias_cols, corner_w=corner_w,
        k1=k1, b1=b1, k2=k2, b2=b2,
    )


def _edge_maps(k1, b1, k2, b2):
    """Derive the exact affine maps (input edge line) -> (output edge
    line) of the UNFUSED head, numerically.

    Output row 0 depends only on input row 0 (m - S*i + P1 ∈ [0, K1)
    with m ≤ P2 ⇒ i = 0), and both head convs are translation-invariant
    maps of their zero-extended inputs — so each border line of the
    output is a width-3 conv1d of the adjacent input line (S phase
    outputs per low-res position) plus a bias profile that is constant
    along the line except at the two corner pixels.  This replaces the
    strip convt+conv correction chains with ONE tiny conv per axis
    (top⊕bottom and left⊕right stacked block-diagonally on channels) —
    measured on-chip in tools/head_experiment.py.

    The conv1d is exact everywhere but the 4 corner output pixels: at
    a corner the unfused head reads a zero-padded y column, while the
    TI extension predicts the formula value of y there — so each
    corner (which depends ONLY on the corresponding corner pixel of x:
    y cols 0..P2 there come from x col 0 alone) gets its own [C]-dot
    weight.

    Returns (row_kernel [1,3,2C,2S], col_kernel [3,1,2C,2S],
    bias_rows [2,3], bias_cols [2], corner_w [4,C] tl/tr/bl/br).
    """
    c_in = k1.shape[2]
    W0 = 12  # canvas: center responses must clear the corners
    ctr = W0 // 2

    def run(x):
        y = _convt(x, k1, K1 - 1 - P1) + b1
        return _conv(y, k2, ((P2, P2), (P2, P2))) + b2

    base = run(jnp.zeros((1, W0, W0, c_in), jnp.float32))[0, :, :, 0]
    bias_rows = jnp.stack([
        jnp.stack([base[0, 0], base[0, S * ctr], base[0, -1]]),
        jnp.stack([base[-1, 0], base[-1, S * ctr], base[-1, -1]]),
    ])
    bias_cols = jnp.stack([base[S * ctr, 0], base[S * ctr, -1]])

    # impulse canvases: top, bottom, left, right edge-center impulses
    # plus the 4 corner impulses (tl, tr, bl, br)
    eye = jnp.arange(c_in)
    imp = jnp.zeros((8 * c_in, W0, W0, c_in), jnp.float32)
    imp = imp.at[eye, 0, ctr, eye].set(1.0)
    imp = imp.at[c_in + eye, -1, ctr, eye].set(1.0)
    imp = imp.at[2 * c_in + eye, ctr, 0, eye].set(1.0)
    imp = imp.at[3 * c_in + eye, ctr, -1, eye].set(1.0)
    imp = imp.at[4 * c_in + eye, 0, 0, eye].set(1.0)
    imp = imp.at[5 * c_in + eye, 0, -1, eye].set(1.0)
    imp = imp.at[6 * c_in + eye, -1, 0, eye].set(1.0)
    imp = imp.at[7 * c_in + eye, -1, -1, eye].set(1.0)
    resp = run(imp)[..., 0]  # [8C, S*W0, S*W0]

    corner_w = jnp.stack([
        resp[4 * c_in:5 * c_in, 0, 0] - base[0, 0],
        resp[5 * c_in:6 * c_in, 0, -1] - base[0, -1],
        resp[6 * c_in:7 * c_in, -1, 0] - base[-1, 0],
        resp[7 * c_in:, -1, -1] - base[-1, -1],
    ])  # [4, C]

    # out[0, S*v+p] = Σ_δ T[δ, c, p] · x[0, v+δ-1, c]  ⇒  an impulse at
    # column ctr lands at v = ctr+1-δ, i.e. T[δ,c,p] = r[c, S*(ctr+1-δ)+p]
    def gather(lines, bias_line):
        r = lines - bias_line  # [C, S*W0]
        t = jnp.stack(
            [
                jax.lax.dynamic_slice_in_dim(r, S * (ctr + 1 - d), S, axis=1)
                for d in range(3)
            ]
        )  # [3, C, S]
        return t

    t_top = gather(resp[:c_in, 0, :], base[0, :])
    t_bot = gather(resp[c_in:2 * c_in, -1, :], base[-1, :])
    t_left = gather(resp[2 * c_in:3 * c_in, :, 0], base[:, 0])
    t_right = gather(resp[3 * c_in:4 * c_in, :, -1], base[:, -1])

    def block_diag(ta, tb):  # [3,C,S] x2 -> [3, 2C, 2S]
        z = jnp.zeros_like(ta)
        return jnp.concatenate(
            [
                jnp.concatenate([ta, z], axis=2),
                jnp.concatenate([z, tb], axis=2),
            ],
            axis=1,
        )

    row_kernel = block_diag(t_top, t_bot)[None]            # [1,3,2C,2S]
    col_kernel = block_diag(t_left, t_right)[:, None]      # [3,1,2C,2S]
    return row_kernel, col_kernel, bias_rows, bias_cols, corner_w


def _edge_lines(x, head: FoldedHead, dtype):
    """Exact output border lines via the width-3 phase conv1ds.

    One [1,3] conv computes top⊕bottom, one [3,1] conv left⊕right (the
    two lines ride the channel dim block-diagonally).  Zero conv
    padding reproduces the unfused head's corner semantics exactly
    (both head convs are TI maps of zero-extended inputs, _edge_maps).
    Returns top, bot [N,1,S*w,1] (corners exact) and left, right
    [N,S*h,1,1] whose outermost P2 rows are corner pixels carrying the
    wrong (interior-of-edge) bias — the caller slices them off; the
    row lines own the corners.
    """
    n, h, w, _ = x.shape
    xd = x.astype(dtype)

    rows_in = jnp.concatenate([xd[:, 0], xd[:, -1]], axis=-1)[:, None]
    rows_out = _conv(
        rows_in, head.row_kernel.astype(dtype), ((0, 0), (1, 1))
    )  # [N, 1, w, 2S]
    br = head.bias_rows.astype(dtype)

    def profile(b3, length):
        p = jnp.full((length,), b3[1], dtype)
        return p.at[0].set(b3[0]).at[-1].set(b3[2])[None, None, :, None]

    top = rows_out[..., :S].reshape(n, 1, S * w, 1) + profile(br[0], S * w)
    bot = rows_out[..., S:].reshape(n, 1, S * w, 1) + profile(br[1], S * w)

    # the conv1d is wrong only at the 4 corner pixels (zero-padded vs
    # formula-extended y column, _edge_maps): overwrite with the exact
    # corner dot of the corresponding x corner pixel
    cw = head.corner_w.astype(dtype)
    crn = lambda i, px: jnp.einsum("nc,c->n", px, cw[i])[:, None]
    top = top.at[:, 0, 0].set(crn(0, xd[:, 0, 0]) + br[0, 0])
    top = top.at[:, 0, -1].set(crn(1, xd[:, 0, -1]) + br[0, 2])
    bot = bot.at[:, 0, 0].set(crn(2, xd[:, -1, 0]) + br[1, 0])
    bot = bot.at[:, 0, -1].set(crn(3, xd[:, -1, -1]) + br[1, 2])

    cols_in = jnp.concatenate([xd[:, :, 0], xd[:, :, -1]], axis=-1)[:, :, None]
    cols_out = _conv(
        cols_in, head.col_kernel.astype(dtype), ((1, 1), (0, 0))
    )  # [N, h, 1, 2S]
    bc = head.bias_cols.astype(dtype)
    left = cols_out[..., :S].reshape(n, S * h, 1, 1) + bc[0]
    right = cols_out[..., S:].reshape(n, S * h, 1, 1) + bc[1]
    return top, bot, left, right


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

    top, bot, left, right = _edge_lines(x, head, dtype)
    # left/right strips exclude the top/bottom P2 rows (those corners
    # are already fully corrected by the row strips — and the conv1d
    # column lines only carry the interior-of-edge bias)
    left = left[:, P2:-P2]
    right = right[:, P2:-P2]

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
