"""Dataset converters: COCO / OCHuman / Supervisely -> common format.

Offline ETL (SURVEY.md §1 L1): run once per source dataset; training
only ever reads the converted output.  No pycocotools / ochumanApi /
supervisely_lib dependency — the mask codecs live in core.rasterize.
"""

from instancesegmentation_tpu.data.converters.coco import transfer_coco
from instancesegmentation_tpu.data.converters.ochuman import transfer_ochuman
from instancesegmentation_tpu.data.converters.supervisely import (
    transfer_supervisely_to_common,
)
from instancesegmentation_tpu.data.converters.migrate import migrate_class_keys
