"""Optional grain-backed training loader (process-parallel decode).

SURVEY.md §7 step 3 names "double-buffered host→HBM prefetch via grain"
as the idiomatic input plan; the default loader (`pipeline.batch_iterator`)
covers prefetch with decode THREADS, which is enough until PIL decode
saturates the GIL.  This module is the scale-up option: the same
batch-dict contract served by a ``grain.python.DataLoader`` with true
multiPROCESS workers (each worker decodes its slice of every batch in a
separate interpreter) and per-process sharding for multi-host DP.

Differences from ``batch_iterator`` (deliberate):
  * ``drop_remainder=True`` always — grain's Batch emits a short tail
    batch instead of padding, which would retrigger XLA compilation; the
    trainer therefore uses this loader for the TRAIN stream only (the
    validation stream needs the padded-tail protocol for exact full-set
    means and stays on ``batch_iterator``).
  * multi-host sharding is by RECORD (``ShardByJaxProcess``), not by
    row-range of a shared global batch: each process draws disjoint
    samples, which is the standard DP input contract (the global batch
    is whatever the processes jointly drew).

Select with ``--loader grain`` (train/config.py); requires nothing
beyond the baked-in grain wheel.
"""
from __future__ import annotations

import dataclasses
from typing import Iterator, Optional

import numpy as np

from instancesegmentation_tpu.data.dataset import InstanceCommonDataset


class _SampleSource:
    """RandomAccessDataSource view of InstanceCommonDataset: decode one
    eligible instance record to the fixed-canvas Sample (dataset.py)."""

    def __init__(self, dataset: InstanceCommonDataset):
        self._dataset = dataset

    def __len__(self) -> int:
        return len(self._dataset)

    def __getitem__(self, idx: int) -> dict:
        s = self._dataset.fetch(int(idx))
        # dict-of-arrays so grain's Batch tree-stacks into the exact
        # host_batch layout (pipeline.host_batch keys)
        return {
            "image": s.image,
            "mask": s.mask,
            "image_hw": s.image_hw,
            "obj_box": s.obj_box,
            "mask_box": s.mask_box,
            "mask_valid": np.asarray(s.mask_valid, bool),
            "keypoints": s.keypoints,
        }


def grain_batch_iterator(
    dataset: InstanceCommonDataset,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    epochs: Optional[int] = 1,
    num_workers: int = 0,
    shard_by_process: bool = False,
    read_threads: int = 8,
) -> Iterator[dict]:
    """Yield host batch dicts via a grain DataLoader.

    ``num_workers=0`` decodes in-process (grain still prefetches with
    ``read_threads`` reader threads); ``num_workers>0`` forks that many
    worker processes.  ``epochs=None`` streams forever.  With
    ``shard_by_process`` each jax process receives a disjoint shard of
    every epoch (multi-host DP); ``batch_size`` is then the PER-PROCESS
    batch.
    """
    import grain.python as gp

    if shard_by_process:
        shard_options = gp.ShardByJaxProcess(drop_remainder=True)
    else:
        shard_options = gp.NoSharding()

    sampler = gp.IndexSampler(
        num_records=len(dataset),
        shard_options=shard_options,
        shuffle=shuffle,
        num_epochs=epochs,
        seed=seed,
    )
    loader = gp.DataLoader(
        data_source=_SampleSource(dataset),
        sampler=sampler,
        operations=[gp.Batch(batch_size=batch_size, drop_remainder=True)],
        worker_count=num_workers,
        read_options=gp.ReadOptions(
            num_threads=read_threads, prefetch_buffer_size=2 * batch_size
        ),
    )
    yield from loader
