"""Post-training int8 quantization (PTQ) for Segment serving.

The serving program is memory-bound (ROOFLINE.md: ~33 MB/img of real
traffic bounds the 59.7 us/img headline), so int8 activations halving
every conv-to-conv tensor are the one lever left after the bf16
traffic work.  This module provides the calibration pass; the
quantized conv itself lives in models/layers._Int8Conv, switched by
the ``quant_mode`` attribute threaded through every block:

- ``quant_mode="off"``   (default): the float path, untouched.
- ``quant_mode="calibrate"``: float math, but every conv records the
  abs-max of its input into a ``quant`` variable collection.
- ``quant_mode="int8"``: symmetric per-tensor activation / per-channel
  weight int8, s8 x s8 -> s32 convs, dequantize in the epilogue.

Scales live OUTSIDE the checkpoint (a ``quant`` collection keyed like
``params``), so float checkpoints stay canonical and quantization is a
serving-time decision:

    qvars = calibrate(model_float, variables, batches)
    qmodel = Segment(in_channels=20, dtype=jnp.bfloat16, quant_mode="int8")
    logits = qmodel.apply({**variables, "quant": qvars}, imgs, hms, train=False)

The reference has no quantized path (this is beyond-parity serving
surface); quality is validated by tests/test_quantize.py (mask
agreement vs the float model on a trained toy checkpoint).
"""
from __future__ import annotations

import jax


def calibrate(model, variables: dict, batches) -> dict:
    """Run calibration batches through ``model`` (built with
    ``quant_mode="calibrate"``) and return the ``quant`` collection of
    per-conv input abs-max scales (running max across batches).

    ``batches`` yields either ``images`` arrays or ``(images, heatmaps)``
    tuples matching the model's ``in_channels``.
    """
    assert getattr(model, "quant_mode", "off") == "calibrate", (
        "calibrate() expects a model constructed with quant_mode='calibrate'"
    )

    from functools import partial

    @partial(jax.jit, static_argnames=("with_hm",))
    def step(variables, quant, images, heatmaps=None, with_hm=False):
        v = dict(variables)
        if quant is not None:
            v["quant"] = quant
        _, mut = model.apply(
            v, images, heatmaps if with_hm else None,
            train=False, mutable=["quant"],
        )
        return mut["quant"]

    quant = None
    for batch in batches:
        if isinstance(batch, (tuple, list)):
            images, heatmaps = batch
            quant = step(variables, quant, images, heatmaps, with_hm=True)
        else:
            quant = step(variables, quant, batch)
    if quant is None:
        raise ValueError("calibrate() needs at least one batch")
    return jax.device_get(quant)
