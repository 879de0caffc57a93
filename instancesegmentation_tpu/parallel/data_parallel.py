"""shard_map data-parallel train/eval steps.

Replicated state + batch-sharded inputs over a 1-D ``('data',)`` mesh:
each shard runs the fused preprocess+forward+backward on its slice with
its own augmentation RNG, gradients/metrics are ``pmean``-ed over ICI,
and BatchNorm computes cross-replica batch statistics through its
``axis_name`` (true sync-BN — the reference's per-device BN is a known
AP hazard, SURVEY.md §7 'hard parts').  Parameters update identically on
every shard, so the state stays replicated without re-broadcast.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

def shard_map(f, mesh, in_specs, out_specs):
    """Version-compat wrapper: jax>=0.8 keyword API, else experimental.

    Replication checking is disabled — flax BatchNorm's internal pmean
    and optax updates confuse the static replication inference.
    """
    if hasattr(jax, "shard_map"):
        return jax.shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
        )
    from jax.experimental.shard_map import shard_map as _sm

    return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False)

from instancesegmentation_tpu.data.pipeline import preprocess_batch
from instancesegmentation_tpu.parallel.mesh import make_mesh
from instancesegmentation_tpu.train.state import TrainState
from instancesegmentation_tpu.train.steps import (
    augment_config,
    batch_mask_iou,
    bce_loss,
    per_sample_mask_iou,
    _forward_inputs,
)


def make_parallel_steps(model, tx, cfg, num_devices=None):
    """Build (mesh, train_step, eval_step, shard_batch) for DP training.

    ``cfg.batch_size`` is the GLOBAL batch and must divide by the mesh
    size.  The model must be constructed with ``bn_axis_name='data'``.
    """
    mesh = make_mesh(num_devices)
    n = mesh.devices.size
    if cfg.batch_size % n:
        raise ValueError(f"global batch {cfg.batch_size} not divisible by {n} devices")

    aug_train = augment_config(cfg, train=True)
    aug_eval = augment_config(cfg, train=False)
    batch_sharding = NamedSharding(mesh, P("data"))

    def shard_batch(batch: dict):
        # multi-host: `batch` holds only this process's local rows
        # (loader-side sharding, multihost.local_batch_slice); assemble
        # the global array without cross-host transfer
        if jax.process_count() > 1:
            import numpy as np

            return {
                k: jax.make_array_from_process_local_data(
                    batch_sharding, np.asarray(v)
                )
                for k, v in batch.items()
            }
        return jax.device_put(batch, batch_sharding)

    def _train_shard(state: TrainState, batch: dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        images, heatmaps, masks = preprocess_batch(batch, rng, aug_train)
        inputs = _forward_inputs(cfg, images, heatmaps)

        from instancesegmentation_tpu.train.steps import make_fwd

        fwd = make_fwd(model, cfg, state.batch_stats, train=True)

        if getattr(cfg, "remat", False):
            fwd = jax.checkpoint(fwd)

        def loss_fn(params):
            logits, updates = fwd(params, *inputs)
            return bce_loss(logits, masks), (logits, updates["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        grads = jax.lax.pmean(grads, "data")
        loss = jax.lax.pmean(loss, "data")
        iou = jax.lax.pmean(batch_mask_iou(jax.nn.sigmoid(logits), masks), "data")
        # batch_stats are already cross-replica means (BN axis_name)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
        )
        return new_state, {"loss": loss, "train_iou": iou}

    train_step = jax.jit(
        shard_map(
            _train_shard,
            mesh=mesh,
            in_specs=(P(), P("data"), P()),
            out_specs=(P(), P()),
        ),
        donate_argnums=(0,),
    )

    def _eval_shard(variables: dict, batch: dict):
        images, heatmaps, masks = preprocess_batch(
            batch, jax.random.PRNGKey(0), aug_eval
        )
        inputs = _forward_inputs(cfg, images, heatmaps)
        from instancesegmentation_tpu.train.steps import make_fwd

        fwd = make_fwd(model, cfg, variables.get("batch_stats"), train=False)
        logits, _ = fwd(variables["params"], *inputs)
        probs = jax.nn.sigmoid(logits)
        # per-sample IoUs come back batch-sharded (same signature as the
        # single-device eval step); the caller averages after tail dedup
        return images, probs, masks, per_sample_mask_iou(probs, masks)

    eval_step = jax.jit(
        shard_map(
            _eval_shard,
            mesh=mesh,
            in_specs=(P(), P("data")),
            out_specs=(P("data"), P("data"), P("data"), P("data")),
        )
    )

    return mesh, train_step, eval_step, shard_batch
