"""Data pipeline: common-format dataset, host loader, device preprocessing,
dataset converters."""

from instancesegmentation_tpu.data.dataset import InstanceCommonDataset
from instancesegmentation_tpu.data.pipeline import (
    AugmentConfig,
    batch_iterator,
    preprocess_batch,
)
