"""The trainer: epoch loop, periodic validation, checkpoint contract.

Faithful (repaired) port of the reference's training control flow
(reference train_instance.py:272-517):

- Adam + BCE, batch 8, 30 epochs (ref :294-299, defaults in config).
- Periodic validation computing mean mask IoU; unlike the reference,
  which silently evaluated only the FIRST val batch (bug SURVEY.md
  §2.3.2), the whole val set is used (``max_val_batches`` caps it).
- Regression guard: if best-IoU minus val-IoU exceeds 0.3, reload the
  branch-best checkpoint and rewind the epoch counter (ref :471-477).
- syn_train: poll the shared checkpoint file; adopt a better (or >10
  epochs staler) peer checkpoint (ref :479-489).
- Save-best gated at val IoU > 0.7 (ref :491-509), atomic writes.

The heatmap-conditioning bug chain of the reference (§2.3.1) is fixed:
with ``in_channels=20`` the rendered heatmaps actually reach the model.
"""
from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from instancesegmentation_tpu.data.dataset import InstanceCommonDataset
from instancesegmentation_tpu.data.pipeline import batch_iterator
from instancesegmentation_tpu.models.segment import Segment
from instancesegmentation_tpu.train.checkpoint import BranchBestCheckpoint
from instancesegmentation_tpu.train.config import TrainConfig
from instancesegmentation_tpu.train.metrics import MetricLogger, dump_image_grid
from instancesegmentation_tpu.train.state import TrainState
from instancesegmentation_tpu.train.steps import make_eval_step, make_train_step


class Trainer:
    def __init__(self, cfg: TrainConfig):
        self.cfg = cfg
        # multi-host DP (parallel/multihost.py): initialize() must have
        # been called by the entry point BEFORE this constructor touches
        # a jax backend.  batch_size is the GLOBAL batch; this process
        # loads only its local row range.  The checkpoint_dir must be a
        # SHARED filesystem (every process reloads from it on the
        # regression/syn_train paths).
        from instancesegmentation_tpu.parallel import multihost

        self._mh = multihost
        self.proc_id, self.proc_count = multihost.process_info()
        self.is_main = self.proc_id == 0
        if self.proc_count > 1 and not cfg.data_parallel:
            raise ValueError("multi-host training requires --data-parallel")
        self.local_slice = (
            multihost.local_batch_slice(cfg.batch_size)
            if self.proc_count > 1
            else None
        )
        bn_axis = "data" if cfg.data_parallel else None
        self.model = Segment(
            in_channels=cfg.in_channels,
            dtype=jnp.bfloat16 if cfg.bfloat16 else jnp.float32,
            bn_axis_name=bn_axis,
        )
        self.tx = optax.adam(cfg.learning_rate)

        rng = jax.random.PRNGKey(cfg.seed)
        size = cfg.out_size
        init_args = [jnp.zeros((1, size, size, 3))]
        if cfg.use_heatmaps:
            init_args.append(jnp.zeros((1, size, size, cfg.in_channels - 3)))
        variables = jax.jit(self.model.init, static_argnames=("train",))(
            rng, *init_args, train=False
        )
        self.state = TrainState.create(variables, self.tx)

        if cfg.data_parallel:
            from instancesegmentation_tpu.parallel.data_parallel import (
                make_parallel_steps,
            )

            self.mesh, self.train_step, self.eval_step, self.shard_batch = (
                make_parallel_steps(self.model, self.tx, cfg)
            )
            self.state = jax.device_put(
                self.state, jax.sharding.NamedSharding(
                    self.mesh, jax.sharding.PartitionSpec()
                )
            )
            self.batch_sharding = jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec("data")
            )
        else:
            self.mesh = None
            self.train_step = make_train_step(self.model, self.tx, cfg)
            self.eval_step = make_eval_step(self.model, cfg)
            self.shard_batch = lambda b: b
            self.batch_sharding = None

        if cfg.checkpoint_backend == "orbax":
            from instancesegmentation_tpu.train.checkpoint_orbax import (
                OrbaxBranchBestCheckpoint,
            )

            self.ckpt = OrbaxBranchBestCheckpoint(cfg.checkpoint_dir)
        else:
            self.ckpt = BranchBestCheckpoint(
                cfg.checkpoint_dir, explicit_path=cfg.checkpoint_save_path
            )
        self.logger = MetricLogger(cfg.out_dir, enabled=self.is_main)
        self.start_epoch = 0
        self.iou_max = 0.0

        ckpt_exists, peer_best = self._ckpt_obs()
        if ckpt_exists:
            self.iou_max = peer_best
        if cfg.continue_train and ckpt_exists:
            print(f"loading checkpoint from {self.ckpt.path}")
            self._load_best()
        elif cfg.pretrained_path and os.path.exists(cfg.pretrained_path):
            print(f"pretrained loading checkpoint from {cfg.pretrained_path}")
            from instancesegmentation_tpu.train.checkpoint import load_checkpoint

            state, _ = load_checkpoint(cfg.pretrained_path, self.state)
            self.state = state
            self.start_epoch = 0

    # ------------------------------------------------------------------
    def _ckpt_obs(self) -> tuple[bool, float]:
        """(exists, best) of the shared checkpoint.  Under multi-host DP
        this is process 0's observation broadcast to everyone, so the
        branches it gates — which in turn gate COLLECTIVE step and
        broadcast calls — are identical on every process even while the
        file is mid-write on some host."""
        if self.proc_count > 1:
            exists_here = self.ckpt.exists()
            obs = self._mh.broadcast_from_main(
                [
                    1.0 if exists_here else 0.0,
                    (self.ckpt.best() or 0.0) if exists_here else 0.0,
                ]
            )
            return bool(obs[0]), float(obs[1])
        exists = self.ckpt.exists()
        return exists, (self.ckpt.best() or 0.0) if exists else 0.0

    def _load_best(self) -> bool:
        """Resume model+optimizer+epoch from the branch-best checkpoint
        (reference load_checkpoint, ref :320-328).  Returns success.

        Multi-host: ONLY process 0 touches the file; success and the
        loaded state are broadcast.  A per-process read could fail or
        see a different version on one host (torn/racing write), which
        would diverge the restart control flow — mismatched collectives
        across hosts hang the job — or silently desynchronize the
        replicated parameters.
        """
        if self.proc_count > 1:
            from jax.experimental import multihost_utils

            ok, epoch = 0.0, 0.0
            state = None
            if self.is_main:
                try:
                    state, meta = self.ckpt.load(self.state)
                    ok, epoch = 1.0, float(meta.get("epoch", 0))
                except Exception as e:  # the reference swallows too
                    print(f"load fail: {e}")
            flags = self._mh.broadcast_from_main([ok, epoch])
            if not flags[0]:
                return False
            template = state if state is not None else self.state
            state = multihost_utils.broadcast_one_to_all(template)
            self.state = jax.device_put(
                state,
                jax.sharding.NamedSharding(
                    self.mesh, jax.sharding.PartitionSpec()
                ),
            )
            self.start_epoch = int(flags[1])
            return True
        try:
            state, meta = self.ckpt.load(self.state)
            self.state = state
            self.start_epoch = int(meta.get("epoch", 0))
            return True
        except Exception as e:  # the reference swallows too (ref :327)
            print(f"load fail: {e}")
            return False

    def _validate(self, valset: InstanceCommonDataset, epoch: int, seed: int) -> float:
        """Mean mask IoU over the FULL val set.

        Unlike the reference (first-batch-only, ref :414-415) this walks
        every batch; the incomplete tail batch is padded for static
        shapes (``drop_last=False`` repeats the tail's first sample) and
        the padded entries are dropped from the mean via the per-sample
        IoU vector, so every val sample counts exactly once.
        """
        cfg = self.cfg
        iou_sum, iou_count = 0.0, 0
        cap = cfg.max_val_batches or None
        first = None
        n_total = len(valset)
        per = cfg.batch_size // self.proc_count
        for k, batch in enumerate(
            batch_iterator(
                valset, cfg.batch_size, shuffle=True, seed=seed, epochs=1,
                drop_last=False, num_threads=cfg.num_threads,
                local_slice=self.local_slice,
            )
        ):
            images, probs, masks, iou_vec = self.eval_step(
                self.state.variables, self.shard_batch(batch)
            )
            # padding repeats the tail's first sample at the END of the
            # GLOBAL batch (pipeline.batch_iterator), so the valid prefix
            # is whatever of the dataset remains at this batch index
            valid = min(cfg.batch_size, n_total - k * cfg.batch_size)
            if self.proc_count > 1:
                # this process's rows are global rows
                # [proc_id*per, (proc_id+1)*per); count the intersection
                # with the valid prefix, reduce across processes at the end
                local = self._mh.host_local_rows(iou_vec)
                lv = int(np.clip(valid - self.proc_id * per, 0, per))
                iou_sum += float(local[:lv].sum())
                iou_count += lv
            else:
                vals = np.asarray(iou_vec)[:valid]
                iou_sum += float(vals.sum())
                iou_count += len(vals)
            if first is None and cfg.log_images and self.is_main:
                first = (images, probs, masks)
            if cap and k + 1 >= cap:
                break
        if first is not None:
            images, probs, masks = first
            to_np = (
                self._mh.host_local_rows
                if self.proc_count > 1
                else np.asarray
            )
            dump_image_grid(
                os.path.join(cfg.out_dir, "viz"),
                f"val_e{epoch:03d}",
                to_np(images), to_np(masks), to_np(probs),
            )
        if self.proc_count > 1:
            iou_sum, iou_count = self._mh.sum_across_processes(
                [iou_sum, float(iou_count)]
            )
        return float(iou_sum / iou_count) if iou_count else 0.0

    # ------------------------------------------------------------------
    def train(self) -> float:
        cfg = self.cfg
        print(f"branch name: {self.ckpt.branch_name}")
        print(f"devices: {jax.devices()}")

        # reproducibility: persist the exact config next to the metrics
        import dataclasses as _dc
        import json as _json

        from instancesegmentation_tpu.data.pipeline import device_prefetch

        if self.is_main:
            os.makedirs(cfg.out_dir, exist_ok=True)
            with open(os.path.join(cfg.out_dir, "config.json"), "w") as f:
                _json.dump(_dc.asdict(cfg), f, indent=2)

        trainset = InstanceCommonDataset(cfg.train_dataset_dir, cfg.canvas)
        valset = InstanceCommonDataset(cfg.val_dataset_dir, cfg.canvas)
        print(f"train samples: {len(trainset)}  val samples: {len(valset)}")

        epoch = self.start_epoch
        rng = jax.random.PRNGKey(cfg.seed)
        last_val = 0.0
        restarts = 0
        # host-side step counter: reading self.state.step would force a
        # device sync every iteration, killing dispatch pipelining
        host_step = int(self.state.step)

        # --profile-steps N: capture a jax.profiler trace of N steady-
        # state train steps (skipping the compile step) into
        # out_dir/profile, viewable in TensorBoard/Perfetto
        profile_started = False
        profile_done = cfg.profile_steps <= 0
        steps_profiled = 0  # own counter: the per-epoch index i0 resets
        profile_dir = os.path.join(cfg.out_dir, "profile")

        while epoch < cfg.epochs:
            restarted = False
            losses = []
            t_start = time.time()
            val_seconds = 0.0  # excluded from the reported img/s
            n_seen = 0
            # double-buffered host->HBM (pre-sharded over the mesh in DP)
            if cfg.loader == "grain":
                from instancesegmentation_tpu.data.grain_loader import (
                    grain_batch_iterator,
                )

                train_stream = grain_batch_iterator(
                    trainset,
                    cfg.batch_size // self.proc_count,
                    shuffle=True, seed=cfg.seed + epoch, epochs=1,
                    num_workers=cfg.grain_workers,
                    shard_by_process=self.proc_count > 1,
                    read_threads=cfg.num_threads,
                )
            else:
                train_stream = batch_iterator(
                    trainset, cfg.batch_size, shuffle=True,
                    seed=cfg.seed + epoch, epochs=1,
                    num_threads=cfg.num_threads,
                    local_slice=self.local_slice,
                )
            batches = device_prefetch(
                train_stream, sharding=self.batch_sharding,
            )
            for i0, batch in enumerate(batches):
                if not profile_done and not profile_started and i0 == 1:
                    # step 0 paid the compile; trace steady-state steps
                    jax.profiler.start_trace(profile_dir)
                    profile_started = True
                step_rng = jax.random.fold_in(rng, host_step)
                self.state, metrics = self.train_step(
                    self.state, batch, step_rng
                )
                host_step += 1
                losses.append(metrics["loss"])
                n_seen += cfg.batch_size

                if profile_started and not profile_done:
                    steps_profiled += 1
                    if steps_profiled >= cfg.profile_steps:
                        jax.block_until_ready(metrics["loss"])
                        jax.profiler.stop_trace()
                        profile_done = True
                        print(f"profiler trace written to {profile_dir}")

                if i0 % cfg.show_iter == cfg.show_iter - 1:
                    loss = float(jnp.mean(jnp.stack(losses)))
                    # train-only rate: validation passes are excluded so
                    # the metric is not deflated every val_iter steps
                    ips = n_seen / max(time.time() - t_start - val_seconds, 1e-9)
                    print(
                        f" [epoch {epoch}] [{i0 * cfg.batch_size}/{len(trainset)}]"
                        f" [loss: {loss:.6f}] [{ips:.1f} img/s]"
                    )
                    self.logger.log(
                        host_step, loss=loss, images_per_sec=ips,
                        train_iou=float(metrics["train_iou"]), epoch=epoch,
                    )
                    losses = []

                if i0 % cfg.val_iter == 0:
                    t_val = time.time()
                    val_iou = self._validate(valset, epoch, seed=cfg.seed + i0)
                    val_seconds += time.time() - t_val
                    last_val = val_iou
                    print(
                        f"{self.ckpt.branch_name} [epoch {epoch}]"
                        f" [val_num:{len(valset)}]"
                        f" [train_batch_iou: {float(metrics['train_iou']):.6f}]"
                        f" [val_iou: {val_iou:.6f}]"
                    )
                    self.logger.log(host_step, val_iou=val_iou, epoch=epoch)

                    # restart budget: the reference can reload forever
                    # when a checkpoint's best IoU is unreachable
                    # (ref :471-489 has no bound); cap it here
                    may_restart = restarts < cfg.max_restarts

                    ckpt_exists, peer_best = self._ckpt_obs()

                    # regression guard (ref :471-477)
                    if (
                        may_restart
                        and self.iou_max - val_iou > cfg.regression_threshold
                        and ckpt_exists
                    ):
                        print(
                            "val_iou too low, reload checkpoint from "
                            + self.ckpt.path
                        )
                        if self._load_best():
                            epoch = self.start_epoch - 1
                            restarted = True
                            restarts += 1
                            break

                    # syn_train adoption (ref :479-489)
                    if ckpt_exists:
                        stale = epoch - self.start_epoch > cfg.stale_epochs
                        if self.iou_max < peer_best or stale:
                            print(f"update model from {self.ckpt.path}")
                            self.iou_max = max(self.iou_max, peer_best)
                            if cfg.syn_train and may_restart:
                                print("syn_train...")
                                if self._load_best():
                                    epoch = self.start_epoch - 1
                                    restarted = True
                                    restarts += 1
                                    break

                    # save-best (ref :491-509); in multi-host DP the
                    # state is replicated, so process 0 alone writes to
                    # the shared checkpoint (iou_max advances everywhere
                    # — val_iou is already the global mean)
                    if val_iou > self.iou_max and val_iou > cfg.save_iou_gate:
                        self.iou_max = val_iou
                        if self.is_main:
                            print(
                                "save branch best checkpoint " + self.ckpt.path
                            )
                            self.ckpt.save(
                                self.state, best=val_iou, epoch=epoch + 1
                            )

            epoch += 1
            if restarted:
                # resync the host step counter with the reloaded state
                # (one device sync per restart, not per step)
                host_step = int(self.state.step)
                continue
        if profile_started and not profile_done:
            # training ended before profile_steps elapsed; close the trace
            jax.profiler.stop_trace()
            print(f"profiler trace written to {profile_dir}")
        self.logger.close()
        return last_val


def main(argv=None):
    from instancesegmentation_tpu.train.config import parse_args

    cfg = parse_args(argv)
    if cfg.multihost:
        # must run before the Trainer constructor initializes a backend
        from instancesegmentation_tpu.parallel import multihost

        multihost.initialize(
            coordinator=cfg.coordinator or None,
            num_processes=cfg.num_processes or None,
            process_id=cfg.process_id if cfg.process_id >= 0 else None,
        )
    Trainer(cfg).train()


if __name__ == "__main__":
    main()
