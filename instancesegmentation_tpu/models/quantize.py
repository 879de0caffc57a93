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
- ``quant_mode="int8_mxu"``: int8 only for the convs the chip probe
  measured as winners — spatial (k>=2), non-grouped; 1x1 and depthwise
  convs stay float (INT8_PROBE.json: their quantize/dequantize
  epilogues cost more than the MACs save).  Calibration records amax
  for every conv, so the same ``quant`` collection serves both modes
  (flax ignores the extra entries).

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


def _calibrate_model(in_channels: int):
    from instancesegmentation_tpu.models.segment import Segment
    import jax.numpy as jnp

    # calibration runs the float path in f32: amax must see the true
    # activation range, not bf16-rounded values
    return Segment(
        in_channels=in_channels, dtype=jnp.float32, quant_mode="calibrate"
    )


def calibrate_on_dataset(
    variables: dict,
    dataset_dir: str,
    in_channels: int = 20,
    size: int = 480,
    batches: int = 2,
    batch_size: int = 8,
) -> dict:
    """PTQ calibration over the first ``batches`` instance batches of a
    common-format dataset, through the SAME fused preprocess the serving
    path runs (crop-warp + heatmap render) — the activation ranges the
    quantized program will actually see."""
    import jax
    import jax.numpy as jnp

    from instancesegmentation_tpu.data.dataset import InstanceCommonDataset
    from instancesegmentation_tpu.data.pipeline import (
        AugmentConfig,
        batch_iterator,
        preprocess_batch,
    )

    model = _calibrate_model(in_channels)
    ds = InstanceCommonDataset(dataset_dir)
    aug = AugmentConfig(out_size=(size, size))

    def gen():
        for k, batch in enumerate(
            batch_iterator(ds, batch_size, shuffle=False, epochs=1,
                           drop_last=False)
        ):
            if k >= batches:
                break
            images, heatmaps, _ = preprocess_batch(
                batch, jax.random.PRNGKey(0), aug
            )
            if in_channels > 3:
                yield images, heatmaps
            else:
                yield jnp.asarray(images)

    return calibrate(model, variables, gen())


def calibrate_on_images(
    variables: dict,
    images: list,
    in_channels: int = 3,
    size: int = 512,
) -> dict:
    """PTQ calibration on raw RGB uint8 images (whole-image serving):
    resize + the engine's exact normalize; conditioned checkpoints see
    the zero heatmaps whole-image mode serves with."""
    import cv2
    import jax.numpy as jnp
    import numpy as np

    if not images:
        raise ValueError("calibrate_on_images() needs at least one image")
    model = _calibrate_model(in_channels)
    batch = np.stack(
        [
            cv2.resize(img, (size, size), interpolation=cv2.INTER_LINEAR)
            for img in images
        ]
    ).astype(np.float32)
    x = jnp.asarray(batch) / 127.5 - 1.0
    if in_channels > 3:
        hm = jnp.zeros(x.shape[:3] + (in_channels - 3,), x.dtype)
        return calibrate(model, variables, [(x, hm)])
    return calibrate(model, variables, [x])
