"""Multi-host (multi-process) initialization for data parallelism.

SURVEY.md §2.5 / VERDICT r1 missing#5: a single v5e-8 host needs no
``jax.distributed``, but scaling DP past one host (v5e-16+, or multi
-host CPU testing) requires every process to join a coordination
service before any backend init, so that ``jax.devices()`` is the
GLOBAL device list and ``shard_map`` collectives ride ICI/DCN across
hosts.  This module is the single entry point for that:

    from instancesegmentation_tpu.parallel import multihost
    multihost.initialize(coordinator="10.0.0.1:8476",
                         num_processes=2, process_id=0)

The existing mesh/DP layer then works unchanged — ``make_mesh`` already
builds from ``jax.devices()`` (global), per-process input sharding is
handled by ``local_batch_slice`` below, and parameter updates stay
replicated because every process applies identical pmean-ed gradients.

On TPU pods the three arguments are inferred from the environment
(``initialize()`` with no args); explicit args are for CPU/GPU clusters
and tests (tests/test_multihost.py spawns two CPU processes and psums
across them).
"""
from __future__ import annotations

import os
from typing import Optional

import jax

_initialized = False


def initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Join the jax distributed service (idempotent).

    Must run before any jax backend/device query in the process.  With
    all-None arguments on TPU pod slices, jax infers the topology from
    the runtime environment; otherwise pass all three explicitly
    (the coordinator is ``host:port`` of process 0).
    """
    global _initialized
    if _initialized:
        return
    # all-or-nothing: a half-specified topology reaches
    # jax.distributed.initialize as a confusing partial-config failure,
    # and train/config.py's sentinel mapping (0/-1/"" -> None) makes one
    # easy to produce from the CLI (ADVICE r2 #4)
    given = {"--coordinator": coordinator,
             "--num-processes": num_processes,
             "--process-id": process_id}
    missing = [k for k, v in given.items() if v is None]
    if missing and len(missing) != len(given):
        raise ValueError(
            "multihost.initialize needs either no topology flags (TPU "
            "pod auto-detection) or all three; missing: "
            + ", ".join(missing)
        )
    kwargs = {}
    if coordinator is not None:
        kwargs["coordinator_address"] = coordinator
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    _initialized = True


def process_info() -> tuple[int, int]:
    """(process_index, process_count) — (0, 1) when not distributed."""
    return jax.process_index(), jax.process_count()


def local_batch_slice(global_batch: int) -> slice:
    """The half-open row range of the GLOBAL batch this process feeds.

    Each process's data loader materializes only its slice; together
    with ``jax.make_array_from_process_local_data`` (or the DP layer's
    per-shard ``device_put``) this gives loader-side sharding with no
    cross-host data motion.
    """
    idx, count = process_info()
    if global_batch % count:
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"{count} processes"
        )
    per = global_batch // count
    return slice(idx * per, (idx + 1) * per)


def host_local_rows(arr):
    """This process's rows of a batch-sharded global ``jax.Array`` as
    one numpy array (shards concatenated in global row order).

    ``np.asarray`` on a non-fully-addressable array raises; the trainer
    uses this to read its slice of per-sample eval outputs (iou vector,
    viz tensors) without any cross-host traffic.

    The trainer pairs the result with ``proc_id * per``-style offsets,
    which assumes this process's shards form the contiguous global row
    block ``local_batch_slice`` describes.  That holds for standard
    jax device ordering but is asserted here so an interleaved
    per-process mesh fails loudly instead of silently mis-attributing
    padded-tail rows in metric means (ADVICE r2 #3).
    """
    import numpy as np

    shards = sorted(
        arr.addressable_shards, key=lambda s: s.index[0].start or 0
    )
    rows = np.concatenate([np.asarray(s.data) for s in shards], axis=0)
    expect = local_batch_slice(arr.shape[0])
    starts = [s.index[0].start or 0 for s in shards]
    stops = [
        s.index[0].stop if s.index[0].stop is not None else arr.shape[0]
        for s in shards
    ]
    if min(starts) != expect.start or max(stops) != expect.stop or (
        rows.shape[0] != expect.stop - expect.start
    ):
        raise AssertionError(
            f"host-local shards cover rows [{min(starts)}, {max(stops)})"
            f" (n={rows.shape[0]}), expected contiguous "
            f"[{expect.start}, {expect.stop}); per-process device order "
            "violates the contiguous-block assumption"
        )
    return rows


def sum_across_processes(values):
    """Element-wise sum of a small 1-D float vector over all processes
    (identity when single-process).  Used for global metric reductions
    (e.g. val-IoU sum/count) outside any jitted program."""
    import numpy as np

    vec = np.asarray(values, np.float64)
    if jax.process_count() == 1:
        return vec
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(vec)  # [P, N]
    return np.asarray(gathered).sum(axis=0)


def broadcast_from_main(values):
    """Process 0's copy of a small 1-D float vector, on every process
    (identity when single-process).

    The trainer broadcasts checkpoint-state observations (exists/best)
    so the restart/adoption/save control flow — which gates COLLECTIVE
    step calls — takes the same branch everywhere even if the shared
    checkpoint file is mid-write on some host.
    """
    import numpy as np

    vec = np.asarray(values, np.float64)
    if jax.process_count() == 1:
        return vec
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(vec))[0]


def global_array_from_local(local, mesh, pspec):
    """Assemble a global sharded jax.Array from per-process local rows.

    Thin wrapper over ``jax.make_array_from_process_local_data`` so the
    trainer has one call that works single- and multi-process.
    """
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, pspec)
    return jax.make_array_from_process_local_data(sharding, local)
