"""Flax/linen models (NHWC, TPU-native)."""

from instancesegmentation_tpu.models.segment import Segment
from instancesegmentation_tpu.models.export import fold_batchnorm
from instancesegmentation_tpu.models.fused_stem_hm import (
    fold_stem_hm,
    stem_hm_apply,
)
from instancesegmentation_tpu.models.quantize import calibrate
