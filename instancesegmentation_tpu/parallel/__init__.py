"""Parallelism: device mesh construction + shard_map data parallelism.

The reference has NO distributed layer (SURVEY.md §2.5 — single device,
the only cross-process mechanism is a shared checkpoint file).  This
package is the TPU-native replacement mandated by BASELINE.json:
data-parallel training over an ICI mesh with XLA collectives, degrading
transparently to one chip.  The 257K-param CNN fits per-chip, so
TP/PP/EP and sequence parallelism are N/A by construction (SURVEY.md §5
'long-context: N/A'); scaling axes are batch (here) and spatial
resolution (fully-convolutional model).
"""

from instancesegmentation_tpu.parallel.mesh import make_mesh
from instancesegmentation_tpu.parallel.data_parallel import make_parallel_steps
from instancesegmentation_tpu.parallel.inference import ParallelInferenceEngine
from instancesegmentation_tpu.parallel import multihost
