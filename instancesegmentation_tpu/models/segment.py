"""The Segment network: ENet-style encoder-decoder for one-instance masks.

Topology re-implemented per SURVEY.md §2.6 / reference
``model/segment.py:347-534``, NHWC, fully convolutional (any
/16-divisible input).  Heatmap conditioning is a first-class, wired
option here — the reference *intended* a 20-channel (image + 17
keypoint-heatmap) input but its plumbing was broken (SURVEY.md §2.3.1:
``train_batch`` arity mismatch, heatmaps computed then dropped); this
build fixes it: construct with ``in_channels=20`` and pass ``heatmaps``
to ``__call__``, or ``in_channels=3`` for image-only.

The reference's dead multi-head/deep-supervision region (ref :510-529)
is intentionally not rebuilt (SURVEY.md §2.2).
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from instancesegmentation_tpu.models.layers import (
    Bottleneck3x3,
    Bottleneck5x5,
    BottleneckDim,
    BottleneckDimRes,
    BottleneckDown2,
    BottleneckUpRes,
    ConvTranspose,
    InitHeadS4,
    RawConv,
)


class Segment(nn.Module):
    """Predict a full-resolution single-instance mask logit map.

    Args:
      in_channels: total input channels. 3 = RGB only; 20 = RGB + 17
        keypoint heatmaps (the canonical conditioned mode).
      dtype: compute dtype (bfloat16 recommended on TPU; params stay
        float32).
      bn_axis_name: mesh axis name for cross-replica BatchNorm stats
        under shard_map/pmap data parallelism (None = per-shard stats).

    Call: ``logits = model.apply(vars, images, heatmaps, train=...)``
      images   [N, H, W, 3] float in [-1, 1]
      heatmaps [N, H, W, in_channels-3] float in [0, 1] (omit when
               in_channels == 3)
      returns  [N, H, W, 1] mask logits (sigmoid NOT applied — use
               ``jax.nn.sigmoid`` / sigmoid-BCE-with-logits; the
               reference applied sigmoid in train_batch, ref :534).
    """

    in_channels: int = 20
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    quant_mode: str = "off"

    # channel plan (ref :358-432)
    # init: C -> C+16 at /4; s1: 48 at /8; s2: 128 at /16;
    # s3: cat 256 -> 128 at /16; s4: 48 at /8; s5: 16 at /4; s6: 1 at /1.

    @nn.compact
    def __call__(
        self,
        images,
        heatmaps=None,
        train: bool = False,
        truncate_head: bool = False,
        skip_stem: bool = False,
    ):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                  quant_mode=self.quant_mode)

        init_dim = 16 + self.in_channels

        if skip_stem:
            # serving fast path: ``images`` is the PRE-COMPUTED stem
            # output (models/fused_stem.stem_apply — the exact
            # space-to-depth re-lowering of init_head_s4) at /4 with
            # in_channels+16 channels.  Like truncate_head, always
            # initialize with skip_stem=False so init_conv params exist.
            assert heatmaps is None, "skip_stem expects pre-concatenated stem features"
            assert images.shape[-1] == init_dim, (
                f"stem features have {images.shape[-1]} channels, expected {init_dim}"
            )
            init_down = images.astype(self.dtype)
        else:
            if heatmaps is not None:
                x = jnp.concatenate(
                    [images.astype(self.dtype), heatmaps.astype(self.dtype)], axis=-1
                )
            else:
                x = images.astype(self.dtype)
            assert x.shape[-1] == self.in_channels, (
                f"input has {x.shape[-1]} channels, model expects {self.in_channels}"
            )

            # init stem (ref :357-359)
            init_down = InitHeadS4(planes=16, name="init_conv", **kw)(x, train)

        # section 1 (ref :362-375): /8, 48ch
        b1_down, b1_pool = BottleneckDown2(16, 48, name="bottle1_1", **kw)(init_down, train)
        y = b1_down
        for i in range(4):
            y = Bottleneck3x3(16, name=f"bottle1_x_{i}", **kw)(y, train)
        b1_5 = y

        # section 2 (ref :378-396): /16, 128ch, dilated mix
        b2_down, b2_pool = BottleneckDown2(16, 128, name="bottle2_1", **kw)(b1_5, train)
        y = Bottleneck3x3(48, name="bottle2_x_0", **kw)(b2_down, train)
        y = Bottleneck3x3(48, dilation=2, name="bottle2_x_1", **kw)(y, train)
        y = Bottleneck3x3(48, name="bottle2_x_2", **kw)(y, train)
        y = Bottleneck3x3(48, dilation=4, name="bottle2_x_3", **kw)(y, train)
        b2_8 = Bottleneck5x5(48, name="bottle2_x_4", **kw)(y, train)

        # concat_2 (ref :485): 256ch
        cat2 = jnp.concatenate([b2_8, b2_down], axis=-1)

        # section 3 (ref :399-417): 256 -> 128
        y = BottleneckDimRes(48, 128, use_prelu=True, name="bottle3_1", **kw)(cat2, train)
        y = Bottleneck3x3(48, name="bottle3_x_0", **kw)(y, train)
        y = Bottleneck3x3(48, dilation=2, name="bottle3_x_1", **kw)(y, train)
        y = Bottleneck3x3(48, name="bottle3_x_2", **kw)(y, train)
        y = Bottleneck3x3(48, dilation=4, name="bottle3_x_3", **kw)(y, train)
        b3_8 = Bottleneck5x5(48, name="bottle3_x_4", **kw)(y, train)

        # section 4 (ref :420-426, :492-497): up to /8, 48ch
        b4_1 = BottleneckUpRes(16, 48, skip_channels=48, name="bottle4_1up", **kw)(
            b3_8, b2_pool, train
        )
        cat1 = jnp.concatenate([b1_down, b4_1], axis=-1)  # 96ch (ref :494)
        y = BottleneckDimRes(16, 48, use_prelu=False, name="bottle4_2", **kw)(cat1, train)
        b4_3 = BottleneckDim(16, 48, use_prelu=False, name="bottle4_3", **kw)(y, train)

        # section 5 (ref :429-432, :500-501): up to /4, 16ch
        b5_1 = BottleneckUpRes(
            4, 16, skip_channels=init_dim, name="bottle5_1up", **kw
        )(b4_3, b1_pool, train)
        b5_2 = BottleneckDim(4, 16, use_prelu=False, name="bottle5_2", **kw)(b5_1, train)

        if truncate_head:
            # serving fast path: stop at the 16-ch /4 feature map; the
            # caller applies the algebraically folded section-6 head
            # (models/fused_head.py) which removes the [4H,4W,4]
            # intermediate — the largest activation in the net — from
            # HBM.  Always initialize with truncate_head=False so the
            # bottle6_* params exist (flax only allocates params of
            # modules that are called).
            return b5_2

        # section 6 (ref :435-438, :504-505): /1, 1ch logits
        y = ConvTranspose(4, 8, stride=4, padding=2, dtype=self.dtype, name="bottle6_1")(b5_2)
        logits = RawConv(1, 3, padding=1, dtype=self.dtype, name="bottle6_2")(y, train)
        return logits.astype(jnp.float32)

    def predict(self, variables, images, heatmaps=None):
        """Sigmoid mask probabilities (the reference's export mode, ref :511)."""
        import jax

        logits = self.apply(variables, images, heatmaps, train=False)
        return jax.nn.sigmoid(logits)


def make_segment(in_channels: int = 20, dtype=jnp.float32, bn_axis_name=None) -> Segment:
    """Convenience constructor mirroring ``Segment(in_channel)`` (ref :348)."""
    return Segment(in_channels=in_channels, dtype=dtype, bn_axis_name=bn_axis_name)


def count_params(params) -> int:
    """Total trainable parameter count of a params pytree."""
    import jax

    return sum(p.size for p in jax.tree_util.tree_leaves(params))
