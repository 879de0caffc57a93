"""Training configuration: one dataclass + CLI overrides.

Replaces the reference's hostname-keyed hardcoded dicts (reference
train_instance.py:229-269, SURVEY.md §5 'config/flag system') with an
explicit, serializable config.  Defaults mirror the reference's training
defaults (epoch=30, batch_size=8, show_iter=20, val_iter=120, Adam with
torch's default lr=1e-3, ref :243-247,:297).
"""
from __future__ import annotations

import argparse
import dataclasses
from typing import Optional


@dataclasses.dataclass
class TrainConfig:
    # data
    train_dataset_dir: str = ""
    val_dataset_dir: str = ""
    checkpoint_dir: str = "checkpoints"
    out_dir: str = "runs"
    canvas: int = 640
    out_size: int = 480

    # model
    in_channels: int = 20          # 20 = RGB + 17 heatmaps; 3 = image-only
    bfloat16: bool = True          # bf16 compute on TPU (params stay f32)

    # optimization
    epochs: int = 30
    batch_size: int = 8
    learning_rate: float = 1e-3    # torch Adam default (ref :297)

    # cadence
    show_iter: int = 20
    val_iter: int = 120
    max_val_batches: int = 0       # 0 = full val set (repairs ref bug §2.3.2)

    # checkpoint contract (reference §2.4)
    continue_train: bool = True
    syn_train: bool = False
    checkpoint_backend: str = "file"   # "file" (atomic single-file) | "orbax"
    pretrained_path: Optional[str] = None
    checkpoint_save_path: Optional[str] = None
    save_iou_gate: float = 0.7     # save-best quality gate (ref :492)
    regression_threshold: float = 0.3  # reload-best threshold (ref :472)
    stale_epochs: int = 10         # syn_train staleness adoption (ref :482)
    max_restarts: int = 20         # bound on reload/adoption restarts
                                   # (the reference can restart forever)

    # augmentation (reference-parity defaults: off; see SURVEY.md §2.9)
    flip_prob: float = 0.0
    jitter: float = 0.0
    rotate: float = 0.0            # max +- degrees (the reference's
                                   # commented-out +-25, ref :153-155)
    rotate_prob: float = 0.6       # imgaug Sometimes(0.6, ...) gate
    rotate_chunk: int = 0          # stage the rotated warp in chunks of
                                   # this many samples (lax.map batch_
                                   # size) — numerically identical.
                                   # 0 = impl default (full-batch vmap
                                   # for gather; 4 for 2pass, whose
                                   # banded one-hot tensors must be
                                   # staged — ROOFLINE.md §6/§7)
    rotate_impl: str = "2level"    # "2level" blocked hats + banded
                                   # residual shift (DEFAULT: rotated
                                   # train 1,842 vs 1,153 img/s at
                                   # batch 128, quality parity at 5
                                   # seeds — ROOFLINE.md §Round-5) |
                                   # "2pass" unblocked banded-matmul
                                   # affine (6× the gather on chip) |
                                   # "gather" 4-tap per-pixel (bit-
                                   # matches the one-pass oracle)
    rotate_block: int = 16         # "2level" hat block size
    brightness: float = 0.0
    contrast: float = 0.0
    noise_std: float = 0.0

    # parallelism
    data_parallel: bool = False    # shard_map over all visible devices
    # multi-host DP (parallel/multihost.py): join jax.distributed before
    # backend init so jax.devices() is the GLOBAL device list and the
    # 'data' mesh spans hosts.  batch_size stays the GLOBAL batch; each
    # process loads only its local_batch_slice.  Empty/negative values
    # mean "infer from the TPU-pod environment".
    multihost: bool = False
    coordinator: str = ""          # host:port of process 0
    num_processes: int = 0
    process_id: int = -1

    # rematerialization: recompute the forward during backward instead
    # of storing activations (jax.checkpoint).  The train step is
    # HBM-bound with ~10x compute headroom (ROOFLINE.md training
    # table), so trading FLOPs for activation traffic can pay.
    remat: bool = False

    # run the training forward with the algebraically folded section-6
    # head (models/fused_head.py): bottle6_1∘bottle6_2 computed as one
    # phase conv + exact edge conv1ds, re-derived from the live params
    # every step (differentiable, so gradients flow to the original
    # bottle6_* params).  Same math; bf16 reduction order differs
    # slightly from the unfused pair.  Measured on-chip (r4, 480²,
    # ROOFLINE_train_fused.json): batch 8 382→677 img/s (+77%), batch
    # 128 2,419→2,712 (+12%) — hence default ON; --fused-head false
    # restores the unfused pair.
    fused_head: bool = True

    # profiling (SURVEY.md §5 'tracing': jax.profiler traces +
    # step-time counters; 0 = off)
    profile_steps: int = 0         # trace N steady-state train steps
                                   # into out_dir/profile

    # input pipeline
    # "threads": pipeline.batch_iterator (threaded decode + prefetch);
    # "grain": data/grain_loader.py — grain DataLoader with
    # process-parallel decode workers (train stream only; validation
    # always uses the padded-tail threaded protocol)
    loader: str = "threads"
    grain_workers: int = 0         # decode worker processes (0 = in-proc)

    # misc
    seed: int = 0
    num_threads: int = 8
    log_images: bool = True

    @property
    def use_heatmaps(self) -> bool:
        return self.in_channels > 3

    @property
    def out_hw(self) -> tuple[int, int]:
        return (self.out_size, self.out_size)


def parse_args(argv=None) -> TrainConfig:
    """Build a TrainConfig from CLI flags (every field overridable)."""
    parser = argparse.ArgumentParser(description="train instance segmentation")
    for field in dataclasses.fields(TrainConfig):
        name = "--" + field.name.replace("_", "-")
        if field.type == "bool" or isinstance(field.default, bool):
            parser.add_argument(
                name,
                type=lambda s: s.lower() in ("1", "true", "yes"),
                default=field.default,
            )
        else:
            ftype = (
                str
                if field.default is None
                else type(field.default)
            )
            parser.add_argument(name, type=ftype, default=field.default)
    ns = parser.parse_args(argv)
    return TrainConfig(**vars(ns))
