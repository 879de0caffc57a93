"""Training subsystem: config, jitted steps, checkpointing, trainer loop."""

from instancesegmentation_tpu.train.config import TrainConfig
from instancesegmentation_tpu.train.state import TrainState
from instancesegmentation_tpu.train.loop import Trainer
