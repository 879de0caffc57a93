"""Batched inference: one fused XLA program from decoded pixels to masks."""

from instancesegmentation_tpu.infer.pipeline import (
    InferenceEngine,
    load_any_checkpoint,
)
from instancesegmentation_tpu.infer.server import ServingFrontend
