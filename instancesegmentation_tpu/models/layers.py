"""Building blocks of the Segment encoder-decoder (flax/linen, NHWC).

Re-implementation of the nine block types catalogued in SURVEY.md §2.1
(#1-#6), designed for XLA on TPU: channels-last layout, explicit
torch-style paddings (so shapes AND edge values match the reference —
'SAME' would pad (1,2) where the reference pads (2,2) for k=5,s=2),
depthwise convs via feature_group_count, transposed convs expressed as
input-dilated convolutions which XLA lowers onto the MXU directly.

Structural parity citations refer to /root/reference/model/segment.py.
Faithfully reproduced quirks (load-bearing for weight-import parity):

- ``Bottleneck5x5``: the (5,1) depthwise conv is *raw* — bias, no BN,
  no activation (ref :91-92), while the (1,5) leg has BN+PReLU.
- ``BottleneckDimRes``: both ``use_prelu`` branches use PReLU *inside*
  the bottleneck (ref :174-188); only the post-residual activation
  switches between PReLU and ReLU.
- ``BottleneckDim`` with ``use_prelu=False``: the middle 3x3 conv is
  dense, not depthwise (ref :242), with ReLU activations inside.
- ``BottleneckDown2`` returns the max-pooled *input features* as the
  skip tensor (ref :145-150) — not pooling indices, despite the
  caller's naming.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

#: Kaiming fan-in normal, matching the reference init (ref :451-463:
#: kaiming_normal_(mode='fan_in', nonlinearity='relu'), zero bias).
kaiming_normal_init = nn.initializers.variance_scaling(
    2.0, "fan_in", "normal"
)


def autopad(k: Union[int, Sequence[int]], p=None):
    """torch-style 'same' padding: k//2 per spatial dim (ref :12-16)."""
    if p is None:
        p = k // 2 if isinstance(k, int) else tuple(x // 2 for x in k)
    return p


def _pair(v) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def _pad_pairs(p) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    ph, pw = _pair(p)
    return ((ph, ph), (pw, pw))


class PReLU(nn.Module):
    """Per-channel PReLU (torch ``nn.PReLU(planes)``, init 0.25)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha", nn.initializers.constant(0.25), (x.shape[-1],), jnp.float32
        )
        alpha = alpha.astype(self.dtype)
        x = x.astype(self.dtype)
        return jnp.where(x >= 0, x, alpha * x)


def apply_act(act: Optional[str], x, module: nn.Module, name: str, dtype):
    """Apply a named activation ('prelu' allocates params under ``name``)."""
    if act is None:
        return x
    if act == "prelu":
        return PReLU(dtype=dtype, name=name)(x)
    if act == "relu":
        return nn.relu(x)
    if act == "hardswish":
        return nn.hard_swish(x)
    raise ValueError(f"unknown activation {act!r}")


class _Int8Conv(nn.Module):
    """Drop-in int8 (PTQ) replacement for an ``nn.Conv(name="conv")``.

    Identical param tree ({kernel, bias}, f32, same shapes/inits) so a
    float checkpoint loads unchanged; adds one ``quant`` collection
    variable ``amax`` (per-tensor input abs-max, filled by a
    calibration pass — see models/quantize.py).

    mode="calibrate": run the float conv, update ``amax`` (requires
    ``mutable=["quant"]``) — numerically identical to the float path.
    mode="int8": symmetric per-tensor input / per-out-channel weight
    quantization, s8 x s8 -> s32 conv on the int8 MXU path, dequantized
    in the epilogue.  Between consecutive quantized convs only the int8
    tensor crosses HBM (the float producer fuses into the quantize op),
    which is the point on this memory-bound net (ROOFLINE.md).
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Tuple[Tuple[int, int], Tuple[int, int]]
    feature_group_count: int
    kernel_dilation: Tuple[int, int]
    mode: str = "int8"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        cin = x.shape[-1] // self.feature_group_count
        kernel = self.param(
            "kernel", kaiming_normal_init,
            (kh, kw, cin, self.features), jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        amax = self.variable(
            "quant", "amax", lambda: jnp.zeros((), jnp.float32)
        )

        def _conv(lhs, rhs, acc_t):
            return jax.lax.conv_general_dilated(
                lhs, rhs,
                window_strides=self.strides,
                padding=self.padding,
                feature_group_count=self.feature_group_count,
                rhs_dilation=self.kernel_dilation,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc_t,
            )

        if self.mode == "calibrate":
            if not self.is_initializing():
                amax.value = jnp.maximum(
                    amax.value, jnp.max(jnp.abs(x.astype(jnp.float32)))
                )
            y = _conv(x.astype(self.dtype), kernel.astype(self.dtype),
                      self.dtype)
            return y + bias.astype(y.dtype)

        s_in = jnp.maximum(amax.value, 1e-6) / 127.0
        xq = jnp.clip(
            jnp.round(x.astype(jnp.float32) / s_in), -127, 127
        ).astype(jnp.int8)
        s_w = jnp.maximum(
            jnp.max(jnp.abs(kernel), axis=(0, 1, 2)), 1e-12
        ) / 127.0  # per out channel
        kq = jnp.clip(jnp.round(kernel / s_w), -127, 127).astype(jnp.int8)
        acc = _conv(xq, kq, jnp.int32)
        y = acc.astype(jnp.float32) * (s_in * s_w) + bias
        return y.astype(self.dtype)


def _int8_selected(mode: str, k: Tuple[int, int], groups: int) -> bool:
    """Which convs a quant_mode covers.

    "int8" / "calibrate": every conv (calibrate must record amax for
    all convs so ONE calibration pass serves every int8 variant).
    "int8_mxu": only spatial (k>=2), non-grouped convs — the chip probe
    (INT8_PROBE.json, r4) measured int8 3x3 convs at 0.69-0.79x bf16
    but 1x1 convs at 0.99-1.92x and depthwise at 1.05-1.64x (the
    quantize/dequantize epilogues cost more than the tiny MACs save),
    so the selective mode keeps the losers float.
    """
    if mode == "int8_mxu":
        return groups == 1 and max(k) >= 2
    return True


class ConvBN(nn.Module):
    """Conv2d(bias) + BatchNorm + activation (reference ``Conv``, ref :34-48).

    ``padding=None`` means torch-style autopad (k//2).  BatchNorm runs in
    float32 regardless of compute dtype; ``bn_axis_name`` enables
    cross-replica batch stats under shard_map/pmap.

    ``quant_mode`` ("off" | "calibrate" | "int8" | "int8_mxu") switches
    the conv to the PTQ path at inference (train always runs float) —
    see ``_Int8Conv`` / ``_int8_selected`` / models/quantize.py.
    """

    features: int
    kernel: Union[int, Tuple[int, int]] = 1
    strides: Union[int, Tuple[int, int]] = 1
    padding: Optional[Union[int, Tuple[int, int]]] = None
    groups: int = 1
    dilation: Union[int, Tuple[int, int]] = 1
    act: Optional[str] = "hardswish"
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None
    quant_mode: str = "off"

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = _pair(self.kernel)
        pad = self.padding if self.padding is not None else autopad(self.kernel)
        if (self.quant_mode != "off" and not train
                and _int8_selected(self.quant_mode, k, self.groups)):
            x = _Int8Conv(
                features=self.features,
                kernel_size=k,
                strides=_pair(self.strides),
                padding=_pad_pairs(pad),
                feature_group_count=self.groups,
                kernel_dilation=_pair(self.dilation),
                mode=self.quant_mode,
                dtype=self.dtype,
                name="conv",
            )(x)
        else:
            x = nn.Conv(
                self.features,
                kernel_size=k,
                strides=_pair(self.strides),
                padding=_pad_pairs(pad),
                feature_group_count=self.groups,
                kernel_dilation=_pair(self.dilation),
                use_bias=True,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                kernel_init=kaiming_normal_init,
                name="conv",
            )(x)
        # train: f32 batch statistics for numerical stability.
        # inference: BN is a per-channel affine — run it in the compute
        # dtype so bf16 activations stay bf16 end-to-end (halves the
        # HBM traffic that bounds this model's throughput).
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32 if train else self.dtype,
            axis_name=self.bn_axis_name if train else None,
            name="bn",
        )(x)
        x = x.astype(self.dtype)
        return apply_act(self.act, x, self, "act", self.dtype)


class ConvTranspose(nn.Module):
    """torch-semantics ConvTranspose2d as an input-dilated conv.

    ``y = conv(dilate_s(x), K)`` with padding ``k-1-p`` reproduces
    torch's ``ConvTranspose2d(k, stride=s, padding=p)`` output
    ``(H-1)*s + k - 2p`` exactly.  The kernel is stored conv-ready
    (HWIO, pre-flipped); ``utils.torch_import`` performs the
    transpose+spatial-flip when importing torch weights.
    """

    features: int
    kernel: Union[int, Tuple[int, int]]
    stride: int
    padding: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = _pair(self.kernel)
        in_ch = x.shape[-1]

        # From-scratch init parity quirk: the reference's weights_init
        # only re-initializes nn.Conv2d (ConvTranspose2d is NOT a
        # subclass, ref :451-463), so its transposed convs keep torch's
        # DEFAULT kaiming_uniform(a=sqrt(5)) with fan_in computed from
        # the (in, out, kh, kw) layout => fan_in = out*kh*kw, giving
        # W, b ~ U(-1/sqrt(fan_in), +1/sqrt(fan_in)).
        fan_in = self.features * kh * kw
        bound = 1.0 / (fan_in ** 0.5)

        def _torch_default_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(
                key, shape, dtype, minval=-bound, maxval=bound
            )

        kernel = self.param(
            "kernel",
            _torch_default_init,
            (kh, kw, in_ch, self.features),
            jnp.float32,
        )
        p = self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding=((kh - 1 - p, kh - 1 - p), (kw - 1 - p, kw - 1 - p)),
            lhs_dilation=(self.stride, self.stride),
            rhs_dilation=(1, 1),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", _torch_default_init, (self.features,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        return y


class RawConv(nn.Module):
    """Plain Conv2d with bias, no BN/act (for the reference's raw convs).

    ``quant_mode`` as in ConvBN (PTQ int8 path, inference only — the
    ``train`` gate keeps training float even when a quant_mode is set,
    matching ConvBN; an uncalibrated amax would saturate inputs).
    """

    features: int
    kernel: Union[int, Tuple[int, int]]
    padding: Union[int, Tuple[int, int]] = 0
    groups: int = 1
    dtype: Dtype = jnp.float32
    quant_mode: str = "off"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if (self.quant_mode != "off" and not train
                and _int8_selected(self.quant_mode, _pair(self.kernel),
                                   self.groups)):
            return _Int8Conv(
                features=self.features,
                kernel_size=_pair(self.kernel),
                strides=(1, 1),
                padding=_pad_pairs(self.padding),
                feature_group_count=self.groups,
                kernel_dilation=(1, 1),
                mode=self.quant_mode,
                dtype=self.dtype,
                name="conv",
            )(x)
        return nn.Conv(
            self.features,
            kernel_size=_pair(self.kernel),
            strides=(1, 1),
            padding=_pad_pairs(self.padding),
            feature_group_count=self.groups,
            use_bias=True,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=kaiming_normal_init,
            name="conv",
        )(x)


def max_pool(x, window: int, stride: int):
    """VALID max pool (torch F.max_pool2d semantics for divisible sizes)."""
    return nn.max_pool(x, (window, window), strides=(stride, stride), padding="VALID")


def upsample_nearest_2x(x):
    """Nearest-neighbor 2x upsample == torch UpsamplingNearest2d(scale=2)."""
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


class InitHeadS4(nn.Module):
    """Stride-4 stem: maxpool4 shortcut || two k=5 s=2 PReLU convs,
    channel-concat (shortcut first) -> ``in+16`` channels at 1/4 res
    (ref :19-31)."""

    planes: int = 16
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None
    quant_mode: str = "off"

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                  quant_mode=self.quant_mode)
        short = max_pool(x, 4, 4)
        y = ConvBN(self.planes, 5, 2, padding=2, act="prelu", name="layer1", **kw)(x, train)
        y = ConvBN(self.planes, 5, 2, padding=2, act="prelu", name="layer2", **kw)(y, train)
        return jnp.concatenate([short.astype(y.dtype), y], axis=-1)


class Bottleneck3x3(nn.Module):
    """1x1-reduce -> depthwise 3x3 (opt. dilated) -> 1x1-expand, PReLU
    residual add (ref :52-79)."""

    planes: int
    dilation: int = 1
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None
    quant_mode: str = "off"

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                  quant_mode=self.quant_mode)
        inplanes = x.shape[-1]
        y = ConvBN(self.planes, 1, act="prelu", name="convs_0", **kw)(x, train)
        y = ConvBN(
            self.planes, 3, padding=self.dilation, dilation=self.dilation,
            groups=self.planes, act="prelu", name="convs_1", **kw,
        )(y, train)
        y = ConvBN(inplanes, 1, act=None, name="convs_2", **kw)(y, train)
        return PReLU(dtype=self.dtype, name="prelu")(y + x)


class Bottleneck5x5(nn.Module):
    """Factorized 5x1 + 1x5 depthwise bottleneck (ref :82-111).

    Quirk preserved: the (5,1) leg is a raw biased conv with no BN and
    no activation (ref :91-92)."""

    planes: int
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None
    quant_mode: str = "off"

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                  quant_mode=self.quant_mode)
        inplanes = x.shape[-1]
        y = ConvBN(self.planes, 1, act="prelu", name="convs_0", **kw)(x, train)
        y = RawConv(
            self.planes, (5, 1), padding=(2, 0), groups=self.planes,
            dtype=self.dtype, quant_mode=self.quant_mode, name="convs_1",
        )(y, train)
        y = ConvBN(
            self.planes, (1, 5), padding=(0, 2), groups=self.planes,
            act="prelu", name="convs_2", **kw,
        )(y, train)
        y = ConvBN(inplanes, 1, act=None, name="convs_3", **kw)(y, train)
        return PReLU(dtype=self.dtype, name="prelu")(y + x)


class BottleneckDown2(nn.Module):
    """Stride-2 downsample block (ref :114-150).

    Returns ``(out, pooled_input)``: the second value is the max-pooled
    input feature map consumed later as a decoder skip (ref :145,
    :478/:482 call sites)."""

    planes: int
    outplanes: int
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None
    quant_mode: str = "off"

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                  quant_mode=self.quant_mode)
        y = ConvBN(self.planes, 2, 2, padding=0, act="prelu", name="convs_0", **kw)(x, train)
        y = ConvBN(self.planes, 3, padding=1, groups=self.planes, act="prelu", name="convs_1", **kw)(y, train)
        y = ConvBN(self.outplanes, 1, act=None, name="convs_2", **kw)(y, train)
        pooled = max_pool(x, 2, 2)
        shortcut = ConvBN(self.outplanes, 1, act=None, name="convm", **kw)(pooled, train)
        out = PReLU(dtype=self.dtype, name="prelu")(y + shortcut)
        return out, pooled


class BottleneckDimRes(nn.Module):
    """Channel-changing residual block with 1x1 shortcut projection
    (ref :153-209).  Both branches use PReLU inside the bottleneck
    (ref :174-188); ``use_prelu`` only selects the final activation."""

    planes: int
    outplanes: int
    use_prelu: bool
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None
    quant_mode: str = "off"

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                  quant_mode=self.quant_mode)
        y = ConvBN(self.planes, 1, act="prelu", name="convs_0", **kw)(x, train)
        y = ConvBN(self.planes, 3, padding=1, groups=self.planes, act="prelu", name="convs_1", **kw)(y, train)
        y = ConvBN(self.outplanes, 1, act=None, name="convs_2", **kw)(y, train)
        shortcut = ConvBN(self.outplanes, 1, act=None, name="resconv", **kw)(x, train)
        y = y + shortcut
        if self.use_prelu:
            return PReLU(dtype=self.dtype, name="prelu")(y)
        # dead per-channel PReLU params, allocated but unused, to keep a
        # 1:1 state-dict bijection with the torch reference which
        # allocates self.prelu unconditionally (ref :195-196)
        PReLU(dtype=self.dtype, name="prelu")(jnp.zeros((self.outplanes,), self.dtype))
        return nn.relu(y)


class BottleneckDim(nn.Module):
    """Identity-shortcut channel block (ref :212-261).

    Quirk preserved: with ``use_prelu=False`` the middle 3x3 conv is
    dense (no groups, ref :242) and activations are ReLU."""

    planes: int
    outplanes: int
    use_prelu: bool
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None
    quant_mode: str = "off"

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                  quant_mode=self.quant_mode)
        if self.use_prelu:
            y = ConvBN(self.planes, 1, act="prelu", name="convs_0", **kw)(x, train)
            y = ConvBN(self.planes, 3, padding=1, groups=self.planes, act="prelu", name="convs_1", **kw)(y, train)
        else:
            y = ConvBN(self.planes, 1, act="relu", name="convs_0", **kw)(x, train)
            y = ConvBN(self.planes, 3, padding=1, act="relu", name="convs_1", **kw)(y, train)
        y = ConvBN(self.outplanes, 1, act=None, name="convs_2", **kw)(y, train)
        y = y + x
        if self.use_prelu:
            return PReLU(dtype=self.dtype, name="prelu")(y)
        # dead PReLU params kept for torch state-dict bijection (ref :249)
        PReLU(dtype=self.dtype, name="prelu")(jnp.zeros((self.outplanes,), self.dtype))
        return nn.relu(y)


class BottleneckUpRes(nn.Module):
    """2x upsampling decoder block with skip-feature merge (ref :296-344).

    Main path: 1x1(ReLU) -> ConvTranspose k4 s2 p1 + BN + ReLU -> 1x1.
    Skip path: 1x1-project x, concat with the encoder skip tensor at low
    res, nearest-2x upsample, then a raw 1x1 merge conv (ref :321-331).
    ``skip_channels`` parameterizes the merge conv input width — the
    ``_Other`` variant of ref :338-344 falls out of making it explicit.
    """

    planes: int
    outplanes: int
    skip_channels: int
    dtype: Dtype = jnp.float32
    bn_axis_name: Optional[str] = None
    quant_mode: str = "off"

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        kw = dict(dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                  quant_mode=self.quant_mode)
        y = ConvBN(self.planes, 1, act="relu", name="convs_0", **kw)(x, train)
        y = ConvTranspose(self.planes, 4, stride=2, padding=1, dtype=self.dtype, name="convs_1")(y)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32 if train else self.dtype,
            axis_name=self.bn_axis_name if train else None,
            name="convs_bn",
        )(y)
        y = nn.relu(y.astype(self.dtype))
        y = ConvBN(self.outplanes, 1, act=None, name="convs_2", **kw)(y, train)

        shortcut = ConvBN(self.outplanes, 1, act=None, name="conv2", **kw)(x, train)
        merged = jnp.concatenate([shortcut, skip.astype(shortcut.dtype)], axis=-1)
        assert merged.shape[-1] == self.outplanes + self.skip_channels, (
            f"skip width mismatch: {merged.shape[-1]} != "
            f"{self.outplanes}+{self.skip_channels}"
        )
        # conv-before-upsample: a 1x1 conv is pointwise, so it commutes
        # exactly with nearest-neighbor replication (same value per
        # pixel, bit-identical) — but runs on 4x fewer pixels and lets
        # XLA fuse the repeat into the elementwise add+relu consumer
        # instead of materializing the upsampled 35/96-channel concat
        # for a conv input (measured: the two jnp.repeat broadcasts
        # were among the largest HBM buffers in the whole net, see
        # ROOFLINE.md).  Semantics equal to the reference's
        # upsample-then-conv (ref :321-331).
        shortcut = RawConv(
            self.outplanes, 1, dtype=self.dtype,
            quant_mode=self.quant_mode, name="uppool_conv",
        )(merged, train)
        shortcut = upsample_nearest_2x(shortcut)
        return nn.relu(y + shortcut)
