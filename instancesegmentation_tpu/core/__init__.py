"""Common-annotation-format core library.

Replaces the reference's un-vendored ``ymlib`` surface (reconstructed in
SURVEY.md §2.8) plus the native mask codecs hidden in pycocotools /
ochumanApi (SURVEY.md §2.10): typed-key schema, annotation reader,
record operators, mask/box utilities, polygon/RLE rasterizers, drawing
helpers and evaluation metrics.
"""

from instancesegmentation_tpu.core.keys import (
    key_combine,
    key_decompose,
    ORDER_PART_NAMES,
    BODY_PART_CHOICES,
    CLASS_CHOICES,
)
from instancesegmentation_tpu.core.records import (
    common_ann_loader,
    common_choice,
    common_filter,
    common_transfer,
    untyped_view,
)
from instancesegmentation_tpu.core.boxes import mask2box, box_iou
from instancesegmentation_tpu.core.masks import mask_iou
