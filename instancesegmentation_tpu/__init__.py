"""instancesegmentation_tpu: TPU-native person instance segmentation.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the
YanMiaoW/instanceSegmentation reference (keypoint-conditioned person
instance segmentation), designed TPU-first:

- ``core``     common-annotation-format schema, record ops, mask/box
               utilities, rasterizers, evaluation (replaces the
               un-vendored ``ymlib`` + pycocotools surfaces).
- ``models``   flax/linen Segment encoder-decoder (NHWC, per-channel
               PReLU, BN), BN-folding export transform.
- ``ops``      device-side ops: fused crop-warp sampler, keypoint
               heatmap rendering, RoI-Align / NMS / proposal matching
               (Pallas + XLA).
- ``data``     dataset converters (COCO / OCHuman / Supervisely) and the
               host-side loaders (threaded + grain) that stream
               prebatched tensors to HBM.
- ``train``    jitted train/eval steps, checkpointing (resume /
               regression-reload / syn-train contract), config, metrics.
- ``infer``    batched inference pipeline fused into one XLA program,
               with power-of-2 shape buckets, a folded output head, and
               a dynamic-batching serving frontend.
- ``parallel`` mesh construction + shard_map data parallelism,
               multi-host initialization, DP serving engine.
- ``utils``    torch checkpoint import (parity oracle), profiling.
"""

__version__ = "0.1.0"
