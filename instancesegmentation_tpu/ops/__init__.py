"""Device-side ops: fused crop-warp, heatmap rendering, RoI-Align, NMS,
proposal matching."""

from instancesegmentation_tpu.ops.warp import (
    instance_warp_params,
    warp_batch,
    warp_image,
    warp_points,
)
from instancesegmentation_tpu.ops.heatmap import render_heatmaps
