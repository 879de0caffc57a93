"""Flax/linen models (NHWC, TPU-native)."""

from instancesegmentation_tpu.models.segment import Segment
from instancesegmentation_tpu.models.export import fold_batchnorm
