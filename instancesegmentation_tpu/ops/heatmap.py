"""Vectorized keypoint -> Gaussian heatmap rendering (device-side).

Bit-exact reimplementation of the reference's per-keypoint loop
(reference train_instance.py:33-68) as one fused jnp expression over
all 17 parts: for each visible keypoint at (x, y),

  r      = sqrt(-ln(threshold) * sigma^2)
  window = [max(0, trunc(x-r)), min(w-1, trunc(x+r+1)))   (same for y)
  e      = exp(-((X-x)^2 + (Y-y)^2) / sigma^2)
  hm     = e where (inside window) & (e > threshold), else 0

Quirks preserved exactly: the window upper bound clamps to ``w-1`` /
``h-1`` (so the last row/column is never rendered, ref :52-55) and the
bounds truncate toward zero like Python ``int()``.  Only keypoints with
status 'vis' render (ref :45-47); 'not_vis'/'missing' give zero maps.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def render_heatmaps(
    points_xy: jax.Array,
    visible: jax.Array,
    out_hw: tuple[int, int],
    sigma: float = 10.0,
    threshold: float = 0.01,
) -> jax.Array:
    """Render [K] keypoints to an [H, W, K] heatmap stack.

    points_xy: [K, 2] (x, y) in output-image coordinates (float).
    visible:   [K] bool — True only for status=='vis' keypoints.
    """
    h, w = out_hw
    r = math.sqrt(-math.log(threshold) * sigma * sigma)

    # channels-LAST native: broadcast [H,W,1] coordinate grids against
    # [1,1,K] keypoints so the whole render is one fused elementwise
    # expression producing [H,W,K] directly.  The previous vmap-over-K
    # + transpose([K,H,W]->[H,W,K]) materialized the stack twice (at
    # 480x480x17 f32 that is ~31 MB/instance of pure relayout traffic).
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w, 1), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w, 1), 1)
    pts = points_xy.astype(jnp.float32)
    x = pts[:, 0].reshape(1, 1, -1)
    y = pts[:, 1].reshape(1, 1, -1)

    x_min = jnp.maximum(0.0, jnp.trunc(x - r))
    x_max = jnp.minimum(float(w - 1), jnp.trunc(x + r + 1.0))
    y_min = jnp.maximum(0.0, jnp.trunc(y - r))
    y_max = jnp.minimum(float(h - 1), jnp.trunc(y + r + 1.0))
    e = jnp.exp(-((xs - x) ** 2 + (ys - y) ** 2) / (sigma * sigma))
    inside = (xs >= x_min) & (xs < x_max) & (ys >= y_min) & (ys < y_max)
    return jnp.where(
        visible.reshape(1, 1, -1) & inside & (e > threshold), e, 0.0
    )


def render_heatmaps_numpy(points_xy, visible, out_hw, sigma=10.0, threshold=0.01):
    """NumPy golden port of the reference algorithm, used by tests.

    Direct reimplementation of reference train_instance.py:33-68
    (windowed evaluation, int() truncation, w-1/h-1 clamps).
    """
    import numpy as np

    h, w = out_hw
    r = math.sqrt(-math.log(threshold) * sigma * sigma)
    out = np.zeros((h, w, len(points_xy)), dtype=np.float32)
    for k, ((x, y), vis) in enumerate(zip(points_xy, visible)):
        if not vis:
            continue
        x_min = max(0, int(x - r))
        x_max = min(w - 1, int(x + r + 1))
        y_min = max(0, int(y - r))
        y_max = min(h - 1, int(y + r + 1))
        if x_max <= x_min or y_max <= y_min:
            continue
        xs = np.arange(x_min, x_max)
        ys = np.arange(y_min, y_max)[:, np.newaxis]
        e = np.exp(-((xs - x) ** 2 + (ys - y) ** 2) / sigma**2)
        sel = e > threshold
        region = out[y_min:y_max, x_min:x_max, k]
        region[sel] = e[sel]
    return out
